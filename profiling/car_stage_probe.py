"""Device-true stage breakdown of the MULTI-SQP-ITERATION car workload
(params_car: ns=20, H=15, max_sqp_iter=4 — VERDICT r4 #3).

Same methodology as scan_stage_probe.py (every stage timed as a 50-trip
lax.scan inside ONE dispatch, serially dependent carries), but targeted
at what the car step spends its ~26 ms on: iterations >= 1 run the
hallucination-block GP posterior (batched_update_factor +
predict_update), the op-chain the empty-hall Pallas fusion does not
cover.

Run on the default (TPU) backend:  python profiling/car_stage_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SGPMPC_DTYPE", "float32")
import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402

from bench import build_car                                   # noqa: E402

dtype = jnp.float32
params, spec, data, env = build_car()
dev = jax.devices()[0]
print(f"device: {dev.platform}; car spec ns={spec.ns} H={spec.H} "
      f"sqp_iters={spec.max_sqp_iter} Ty={spec.Ty} g_ny={spec.g_ny}")

from sampling_gpmpc_tpu import agent as agent_mod             # noqa: E402
from sampling_gpmpc_tpu.gp.exact import GPHyperArrays         # noqa: E402
from sampling_gpmpc_tpu.ocp import sqp                        # noqa: E402
from sampling_gpmpc_tpu.ocp.spec import make_ocp_data         # noqa: E402

ocp = make_ocp_data(spec, data, dtype)
hyp = GPHyperArrays.from_spec(spec.gp, dtype)
gp = agent_mod.init_gp_state(spec, env, dtype)
X, U = sqp.init_iterate(spec, dtype, data.start)
eps = agent_mod.make_epistemic(jax.random.PRNGKey(spec.seed), spec, dtype)
st = jnp.asarray(data.start, dtype)
st, X, U, gp, eps, ocp, hyp = jax.device_put(
    (st, X, U, gp, eps, ocp, hyp), dev)
eps0 = eps[0][0]

N = 50


def scan_time(stage, x0, n=N, reps=3):
    def loop(x0):
        return jax.lax.scan(lambda c, _: (stage(c), 0.0), x0,
                            jnp.arange(n))[0]
    f = jax.jit(loop)
    out = jax.block_until_ready(f(x0))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(x0))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


# ---- full SQP solve (4 iterations) ----------------------------------------
def solve_stage(c):
    Xc, Uc = c
    s = sqp.solve(spec, env, hyp, ocp, st, Xc, Uc, gp, eps[0])
    return Xc + 0.0 * s.U[0, 0], Uc

print("full solve (4 iters)       %7.3f ms"
      % (scan_time(solve_stage, (X, U)) * 1e3))


# ---- one SQP iteration, empty hall (fused path) ---------------------------
def iter0_stage(c):
    Xc, Uc = c
    Xn, Un, gp2, sol = sqp.sqp_iteration(
        spec, env, hyp, ocp, st, Xc, Uc, agent_mod.reset_hall(gp), eps0,
        hall_empty=True)
    return Xc + 0.0 * Un[0, 0], Uc

print("sqp iter (hall empty)      %7.3f ms"
      % (scan_time(iter0_stage, (X, U)) * 1e3))


# ---- one SQP iteration with a filled hall block ---------------------------
def make_filled_gp():
    xu = sqp._linearization_inputs(spec, ocp, X, U)
    Xt = xu[..., jnp.asarray(spec.g_idx_inputs)]
    dg, gp1 = agent_mod.sample_dynamics(
        spec, env, hyp, agent_mod.reset_hall(gp), Xt, eps0,
        hall_empty=True)
    return gp1

gp_filled = jax.block_until_ready(jax.jit(make_filled_gp)())
print(f"  (hall fill after iter0: {int(gp_filled.hall_n)} rows)")


def iter1_stage(c):
    Xc, Uc = c
    Xn, Un, gp2, sol = sqp.sqp_iteration(
        spec, env, hyp, ocp, st, Xc, Uc, gp_filled, eps[0][1],
        hall_empty=False)
    return Xc + 0.0 * Un[0, 0], Uc

print("sqp iter (hall block)      %7.3f ms"
      % (scan_time(iter1_stage, (X, U)) * 1e3))


# ---- hall-block GP posterior pieces ---------------------------------------
xu0 = sqp._linearization_inputs(spec, ocp, X, U)
Xt0 = jax.block_until_ready(xu0[..., jnp.asarray(spec.g_idx_inputs)])


def upd_stage(c):
    Xtc = c
    uf = agent_mod.batched_update_factor(spec, hyp, gp_filled)
    return Xtc + 0.0 * uf["Lh"][0, 0, 0, 0] \
        if isinstance(uf, dict) and "Lh" in uf \
        else Xtc + 0.0 * jax.tree_util.tree_leaves(uf)[0].reshape(-1)[0]

print("  update factor (Schur)    %7.3f ms"
      % (scan_time(upd_stage, Xt0) * 1e3))


def post_stage(c):
    Xtc = c
    mean, cov = agent_mod._batched_posterior_incremental(
        spec, hyp, gp_filled, Xtc)
    return Xtc + 0.0 * (mean[0, 0, 0] + cov[0, 0, 0, 0])

print("  posterior (upd+predict)  %7.3f ms"
      % (scan_time(post_stage, Xt0) * 1e3))


def gp_stage(c):
    Xtc = c
    dg, gp2 = agent_mod.sample_dynamics(spec, env, hyp, gp_filled, Xtc,
                                        eps[0][1], hall_empty=False)
    return Xtc + 0.0 * dg[0, 0, 0, 0]

print("  full GP stage (hall)     %7.3f ms"
      % (scan_time(gp_stage, Xt0) * 1e3))


def gp_stage_empty(c):
    Xtc = c
    dg, gp2 = agent_mod.sample_dynamics(
        spec, env, hyp, agent_mod.reset_hall(gp), Xtc, eps0,
        hall_empty=True)
    return Xtc + 0.0 * dg[0, 0, 0, 0]

print("  full GP stage (empty)    %7.3f ms"
      % (scan_time(gp_stage_empty, Xt0) * 1e3))
