"""Ad-hoc stage breakdown of the bench solve on the current device."""
import dataclasses, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SGPMPC_DTYPE", "float32")
import jax, jax.numpy as jnp
from bench import build, setup_solve, time_solve

dtype = jnp.float32
params, spec, data, env = build()
dev = jax.devices()[0]

from sampling_gpmpc_tpu import agent as agent_mod
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

def bt(fn, args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n

# stage 1: GP condition + sample
def stage_gp(st, X, U, gp, eps0):
    xu = sqp._linearization_inputs(spec, ocp, X, U)
    Xt = xu[..., jnp.asarray(spec.g_idx_inputs)]
    dg, gp2 = agent_mod.sample_dynamics(spec, env, hyp, gp, Xt, eps0)
    return dg, gp2

f1 = jax.jit(stage_gp)
print("gp_sample      %.3f ms" % (bt(f1, (st, X, U, gp, eps0)) * 1e3))

# stage 2: + linearize + condense + rows (no QP)
def stage_assemble(st, X, U, gp, eps0):
    xu = sqp._linearization_inputs(spec, ocp, X, U)
    Xt = xu[..., jnp.asarray(spec.g_idx_inputs)]
    dg, gp2 = agent_mod.sample_dynamics(spec, env, hyp, gp, Xt, eps0)
    val, A, B = agent_mod.dyn_linearization(spec, env, xu, dg, ocp.K_fb)
    r = val - jnp.swapaxes(X[1:], 0, 1)
    dx0 = jnp.broadcast_to(st[None], (spec.ns, spec.nx)) - X[0]
    T, Gamma = condense(A, B, r, dx0)
    H_U, g_U = build_cost(spec, ocp, T, Gamma, X, U)
    hard = build_hard_rows(spec, ocp, T, Gamma, X, U)
    soft, pen = build_soft_rows(spec, ocp, T, Gamma, X)
    C_h, d_h = boxes_to_rows(hard.G, hard.lo, hard.hi)
    return H_U, g_U, C_h, d_h, soft, pen

f2 = jax.jit(stage_assemble)
t2 = bt(f2, (st, X, U, gp, eps0))
print("gp+lin+condense+rows %.3f ms" % (t2 * 1e3))

# QP alone on the assembled data
H_U, g_U, C_h, d_h, soft, pen = f2(st, X, U, gp, eps0)
zl, zu, Zl, Zu = pen
qp_args = (H_U, g_U, C_h, d_h, soft.G, soft.lo, soft.hi, zl, zu, Zl, Zu)
qp_args = jax.block_until_ready(qp_args)
f3 = jax.jit(lambda *a: solve_qp_soft(*a))
t3 = bt(f3, qp_args)
sol = f3(*qp_args)
print("qp_solve       %.3f ms  (iters=%d, status=%d)" % (t3 * 1e3, sol.iters, sol.status))

for mi in (1, 5):
    fx = jax.jit(lambda *a: solve_qp_soft(*a, max_iter=mi, tol=1e-30))
    print("qp %2d iters    %.3f ms" % (mi, bt(fx, qp_args) * 1e3))

# full solve for reference
fn, args = setup_solve(spec, data, env, dev, dtype)
print("full solve     %.3f ms" % (time_solve(fn, args) * 1e3))
print("rows: hard=%d soft=%d nU=%d" % (d_h.shape[0], soft.lo.shape[0], g_U.shape[0]))
