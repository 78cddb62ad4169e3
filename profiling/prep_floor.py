"""Bisect the fused QP path's pre/post overhead: padding vs prepare
kernel vs loop vs unscale, on the current device."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SGPMPC_DTYPE", "float32")
import jax, jax.numpy as jnp
from bench import build
from sampling_gpmpc_tpu import agent as agent_mod
from sampling_gpmpc_tpu.gp.exact import GPHyperArrays
from sampling_gpmpc_tpu.ocp import sqp
from sampling_gpmpc_tpu.ocp.spec import make_ocp_data
from sampling_gpmpc_tpu.ocp.assemble import build_cost, build_hard_rows, build_soft_rows
from sampling_gpmpc_tpu.ocp.condense import condense_parallel as condense
from sampling_gpmpc_tpu.ocp.qp import boxes_to_rows
from sampling_gpmpc_tpu.ops import pallas_ipm

dtype = jnp.float32
params, spec, data, env = build()
dev = jax.devices()[0]
ocp = make_ocp_data(spec, data, dtype)
hyp = GPHyperArrays.from_spec(spec.gp, dtype)
gp = agent_mod.init_gp_state(spec, env, dtype)
X, U = sqp.init_iterate(spec, dtype, data.start)
eps = agent_mod.make_epistemic(jax.random.PRNGKey(spec.seed), spec, dtype)[0]
st = jnp.asarray(data.start, dtype)
st, X, U, gp, eps, ocp, hyp = jax.device_put((st, X, U, gp, eps, ocp, hyp), dev)
eps0 = eps[0]


def bt(fn, args, n=100):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def assemble(st, X, U, gp, eps0):
    xu = sqp._linearization_inputs(spec, ocp, X, U)
    Xt = xu[..., jnp.asarray(spec.g_idx_inputs)]
    dg, gp2 = agent_mod.sample_dynamics(spec, env, hyp, gp, Xt, eps0,
                                        hall_empty=True)
    val, A, B = agent_mod.dyn_linearization(spec, env, xu, dg, ocp.K_fb)
    r = val - jnp.swapaxes(X[1:], 0, 1)
    dx0 = jnp.broadcast_to(st[None], (spec.ns, spec.nx)) - X[0]
    T, Gamma = condense(A, B, r, dx0)
    H_U, g_U = build_cost(spec, ocp, T, Gamma, X, U)
    hard = build_hard_rows(spec, ocp, T, Gamma, X, U)
    soft, pen = build_soft_rows(spec, ocp, T, Gamma, X)
    C_h, d_h = boxes_to_rows(hard.G, hard.lo, hard.hi)
    return H_U, g_U, C_h, d_h, soft.G, soft.lo, soft.hi, *pen

qp_args = jax.block_until_ready(jax.jit(assemble)(st, X, U, gp, eps0))
H, g, G_h, d_h, G_s, lo_s, hi_s, zl, zu, Zl, Zu = qp_args
print("shapes:", G_h.shape, G_s.shape)

f32 = jnp.float32
nU = g.shape[0]
m_h, m_s = d_h.shape[0], lo_s.shape[0]
LANES = pallas_ipm.LANES
nU_p = max(8, -(-nU // 8) * 8)
m_hp = -(-m_h // LANES) * LANES
m_sp = -(-m_s // LANES) * LANES


def pad_only(H, g, G_h, d_h, G_s, lo_s, hi_s, zl, zu, Zl, Zu):
    Hp = jnp.zeros((nU_p, nU_p), f32).at[:nU, :nU].set(H)
    Hp = Hp + jnp.diag(jnp.arange(nU_p) >= nU).astype(f32)
    gpr = jnp.pad(g[None], ((0, 0), (0, nU_p - nU)))
    Gthr = jnp.pad(G_h.T, ((0, nU_p - nU), (0, m_hp - m_h)))
    dhr = jnp.pad(d_h[None], ((0, 0), (0, m_hp - m_h)))
    Gtsr = jnp.pad(G_s.T, ((0, nU_p - nU), (0, m_sp - m_s)))
    sr = jnp.pad(jnp.stack([lo_s, hi_s, zl, zu, Zl, Zu, jnp.ones_like(lo_s)]),
                 ((0, 0), (0, m_sp - m_s)))
    return Hp, gpr, Gthr, dhr, Gtsr, sr

print("pad only              %.3f ms" % (bt(jax.jit(pad_only), qp_args) * 1e3))


def prep_full(*a):
    return pallas_ipm.run_full(*a, None, None, 3e-5, 1e-7, 0)

print("pad+prepare (0 iters) %.3f ms" % (bt(jax.jit(prep_full), qp_args) * 1e3))

from sampling_gpmpc_tpu.ocp.qp import solve_qp_soft
for mi in (0, 1, 12):
    f = jax.jit(lambda *a, mi=mi: solve_qp_soft(*a, max_iter=mi))
    print("solve max_iter=%-3d    %.3f ms" % (mi, bt(f, qp_args) * 1e3))
