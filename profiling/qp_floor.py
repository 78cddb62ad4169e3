"""Fine-grained floor breakdown of the bench solve's two stages.

Splits the structured QP into (pre-loop assembly) vs (fused Mehrotra loop)
and the empty-hall GP stage into (posterior) vs (sample+overrides+append),
all pipelined (dispatch N, block once) so relay RPC latency is not charged
per call.
"""
import dataclasses, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SGPMPC_DTYPE", "float32")
import jax, jax.numpy as jnp
from bench import build

dtype = jnp.float32
params, spec, data, env = build()
dev = jax.devices()[0]

from sampling_gpmpc_tpu import agent as agent_mod
from sampling_gpmpc_tpu.gp import exact
from sampling_gpmpc_tpu.gp.exact import GPHyperArrays
from sampling_gpmpc_tpu.ocp import sqp
from sampling_gpmpc_tpu.ocp.spec import make_ocp_data
from sampling_gpmpc_tpu.ocp.assemble import build_cost, build_hard_rows, build_soft_rows
from sampling_gpmpc_tpu.ocp.condense import condense_parallel as condense
from sampling_gpmpc_tpu.ocp.qp import boxes_to_rows, solve_qp_soft

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


# ---- GP stage (empty-hall, the bench's peeled path) -----------------------
def gp_posterior(X, U, gp):
    xu = sqp._linearization_inputs(spec, ocp, X, U)
    Xt = xu[..., jnp.asarray(spec.g_idx_inputs)]
    return agent_mod._batched_posterior_real(spec, hyp, gp, Xt), Xt


def gp_full(X, U, gp, eps0):
    xu = sqp._linearization_inputs(spec, ocp, X, U)
    Xt = xu[..., jnp.asarray(spec.g_idx_inputs)]
    return agent_mod.sample_dynamics(spec, env, hyp, gp, Xt, eps0,
                                     hall_empty=True)


t_post = bt(jax.jit(gp_posterior), (X, U, gp))
t_gpfull = bt(jax.jit(gp_full), (X, U, gp, eps0))
print("gp posterior (empty hall)     %.3f ms" % (t_post * 1e3))
print("gp full (post+sample+append)  %.3f ms" % (t_gpfull * 1e3))

# ---- QP: assembly vs loop --------------------------------------------------
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
    return H_U, g_U, C_h, d_h, soft, pen

qp_in = jax.jit(assemble)(st, X, U, gp, eps0)
H_U, g_U, C_h, d_h, soft, pen = jax.block_until_ready(qp_in)
zl, zu, Zl, Zu = pen
qp_args = (H_U, g_U, C_h, d_h, soft.G, soft.lo, soft.hi, zl, zu, Zl, Zu)

t_asm = bt(jax.jit(assemble), (st, X, U, gp, eps0))
print("gp+lin+condense+rows          %.3f ms" % (t_asm * 1e3))

for mi, label in ((150, "full"), (1, "1it "), (12, "12it")):
    f = jax.jit(lambda *a, mi=mi: solve_qp_soft(*a, max_iter=mi))
    t = bt(f, qp_args)
    sol = f(*qp_args)
    print("qp %s                       %.3f ms (iters=%d)"
          % (label, t * 1e3, int(sol.iters)))

# pre-loop only: max_iter=0 exercises equilibration + st0 + unscale with
# zero kernel trips
f0 = jax.jit(lambda *a: solve_qp_soft(*a, max_iter=0))
print("qp pre-loop (max_iter=0)      %.3f ms" % (bt(f0, qp_args) * 1e3))

# with warm start state from a previous solve
sol = jax.jit(lambda *a: solve_qp_soft(*a))(*qp_args)
ws = jax.block_until_ready(sol.state)
fw = jax.jit(lambda *a: solve_qp_soft(*a, ws=ws, ws_valid=jnp.asarray(True)))
solw = fw(*qp_args)
print("qp warm                       %.3f ms (iters=%d)"
      % (bt(fw, qp_args) * 1e3, int(solw.iters)))

# full solve for reference
jfull = jax.jit(lambda st, X, U, gp, eps: sqp.solve(
    spec, env, hyp, ocp, st, X, U, gp, eps))
out = jfull(st, X, U, gp, eps)
jax.block_until_ready(out.X)
t_full = bt(lambda *a: jfull(*a).X, (st, X, U, gp, eps), n=50)
print("full solve                    %.3f ms" % (t_full * 1e3))
