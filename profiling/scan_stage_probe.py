"""Device-true stage breakdown: each stage timed as a 100-trip lax.scan
inside ONE dispatch, so relay dispatch rate cannot pollute the numbers.

The carry threads each trip's output into the next trip's input (where
shapes allow) or folds a scalar of it into an input, preventing both DCE
and cross-trip overlap from hiding real latency.
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

N = 50


def scan_time(stage, x0, n=N, reps=3):
    """stage: x -> x (same pytree structure). One dispatch for n trips."""
    def loop(x0):
        return jax.lax.scan(lambda c, _: (stage(c), 0.0), x0,
                            jnp.arange(n))[0]
    f = jax.jit(loop)
    out = f(x0)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(x0)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


# ---- full mpc step (reference point; should match megastep probe) ---------
from bench import _mpc_step, setup_closed_loop
from sampling_gpmpc_tpu.dempc import shift_solution
K_fb = (jnp.asarray(data.K_fb, dtype) if spec.use_feedback else None)
goal = jnp.asarray(data.goal, dtype)
ws = sqp.init_qp_ws(spec, dtype)
carry0 = (st, X, U, gp, ws, jnp.asarray(False))


def mpc_stage(c):
    x, Xc, Uc, gpc, wsc, wvc = c
    return _mpc_step(spec, env, hyp, ocp, x, Xc, Uc, gpc, wsc, wvc, eps,
                     K_fb, goal, shift_solution)

print("full mpc step          %.3f ms" % (scan_time(mpc_stage, carry0) * 1e3))


# ---- GP stage (empty hall), carry (X, U, gp) -------------------------------
def gp_stage(c):
    Xc, Uc, gpc = c
    xu = sqp._linearization_inputs(spec, ocp, Xc, Uc)
    Xt = xu[..., jnp.asarray(spec.g_idx_inputs)]
    dg, gp2 = agent_mod.sample_dynamics(spec, env, hyp, gpc, Xt, eps0,
                                        hall_empty=True)
    # fold dg back into X so trips are serially dependent
    Xn = Xc + 0.0 * dg[0, 0, 0, 0]
    return Xn, Uc, gp2._replace(hall_Z=gpc.hall_Z, hall_Y=gpc.hall_Y,
                                hall_n=gpc.hall_n)

print("gp stage (empty hall)  %.3f ms" % (scan_time(gp_stage, (X, U, gp)) * 1e3))


# ---- assemble stage (lin+condense+rows+boxes), carry X ---------------------
dg0, _ = jax.jit(lambda gpc: agent_mod.sample_dynamics(
    spec, env, hyp, gpc, jnp.swapaxes(X[:spec.H], 0, 1)[...,
    jnp.asarray(spec.g_idx_inputs)], eps0, hall_empty=True))(gp)
dg0 = jax.block_until_ready(dg0)


def asm_stage(c):
    Xc, Uc = c
    xu = sqp._linearization_inputs(spec, ocp, Xc, Uc)
    val, A, B = agent_mod.dyn_linearization(spec, env, xu, dg0, ocp.K_fb)
    r = val - jnp.swapaxes(Xc[1:], 0, 1)
    dx0 = jnp.broadcast_to(st[None], (spec.ns, spec.nx)) - Xc[0]
    T, Gamma = condense(A, B, r, dx0)
    H_U, g_U = build_cost(spec, ocp, T, Gamma, Xc, Uc)
    hard = build_hard_rows(spec, ocp, T, Gamma, Xc, Uc)
    soft, pen = build_soft_rows(spec, ocp, T, Gamma, Xc)
    C_h, d_h = boxes_to_rows(hard.G, hard.lo, hard.hi)
    Xn = Xc + 0.0 * (H_U[0, 0] + C_h[0, 0] + soft.G[0, 0] + d_h[0])
    return Xn, Uc

print("lin+condense+rows      %.3f ms" % (scan_time(asm_stage, (X, U)) * 1e3))


# ---- QP on fixed data, carry the warm-start state --------------------------
def build_qp_args():
    xu = sqp._linearization_inputs(spec, ocp, X, U)
    Xt = xu[..., jnp.asarray(spec.g_idx_inputs)]
    dg, _ = agent_mod.sample_dynamics(spec, env, hyp, gp, Xt, eps0,
                                      hall_empty=True)
    val, A, B = agent_mod.dyn_linearization(spec, env, xu, dg, ocp.K_fb)
    r = val - jnp.swapaxes(X[1:], 0, 1)
    dx0 = jnp.broadcast_to(st[None], (spec.ns, spec.nx)) - X[0]
    T, Gamma = condense(A, B, r, dx0)
    H_U, g_U = build_cost(spec, ocp, T, Gamma, X, U)
    hard = build_hard_rows(spec, ocp, T, Gamma, X, U)
    soft, pen = build_soft_rows(spec, ocp, T, Gamma, X)
    C_h, d_h = boxes_to_rows(hard.G, hard.lo, hard.hi)
    return (H_U, g_U, C_h, d_h, soft.G, soft.lo, soft.hi, *pen)

qp_args = jax.block_until_ready(jax.jit(build_qp_args)())


def qp_stage_cold(c):
    g_p = c
    sol = solve_qp_soft(qp_args[0], g_p, *qp_args[2:])
    return g_p + 0.0 * sol.z[0]

print("qp cold                %.3f ms" % (scan_time(qp_stage_cold, qp_args[1]) * 1e3))


def qp_stage_warm(c):
    g_p, wsc = c
    sol = solve_qp_soft(qp_args[0], g_p, *qp_args[2:], ws=wsc,
                        ws_valid=jnp.asarray(True))
    return g_p + 0.0 * sol.z[0], sol.state

sol0 = jax.jit(lambda: solve_qp_soft(*qp_args))()
print("qp warm                %.3f ms (cold iters=%d)"
      % (scan_time(qp_stage_warm, (qp_args[1], sol0.state)) * 1e3,
         int(sol0.iters)))


# ---- plant step + shift ----------------------------------------------------
def tail_stage(c):
    x, Xc, Uc = c
    u0 = Uc[0]
    if K_fb is not None:
        u0 = u0 - (goal - Xc[0, 0]) @ K_fb.T
    x_next = env.discrete_dyn(Xc[0, 0], u0).reshape(-1)
    Xn, Un = shift_solution(spec, Xc, Uc)
    return x_next, Xn + 0.0 * x_next[0], Un

print("plant+shift            %.3f ms" % (scan_time(tail_stage, (st, X, U)) * 1e3))
