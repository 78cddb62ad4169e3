"""Measure the f32 STATUS_RTOL acceptance band in real closed loops.

``ocp/qp.py`` accepts a QP as status 0 whenever its best KKT residual is
within ``STATUS_RTOL = 1e3`` of the exit tolerance (f32 tol = 3e-5), so a
step could in principle be consumed at a residual of 3e-2.  This script
quantifies how often that actually happens: it replays f32 closed loops
through the host-stepped debug twin (``sqp.solve_recorded`` — identical
update math to ``solve``) and histograms EVERY consumed QP's residual
relative to tol.  Numbers land in BENCH_NOTES ("f32 status-0 band").

Usage:  python profiling/status_band.py [--steps N] [config ...]
"""

import argparse
import dataclasses
import os
import sys

os.environ.setdefault("SGPMPC_DTYPE", "float32")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

F32_TOL = 3e-5          # ocp/qp.py f32 default exit tolerance
BANDS = (1.0, 3.0, 10.0, 100.0, 1000.0)


def run_config(config: str, n_steps: int | None):
    from sampling_gpmpc_tpu import agent as agent_mod
    from sampling_gpmpc_tpu.config import load_problem, make_data
    from sampling_gpmpc_tpu.dempc import shift_solution
    from sampling_gpmpc_tpu.envs import make_env
    from sampling_gpmpc_tpu.gp.exact import GPHyperArrays
    from sampling_gpmpc_tpu.ocp import sqp
    from sampling_gpmpc_tpu.ocp.spec import make_ocp_data

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params, spec, data = load_problem(
        os.path.join(here, "params", config + ".yaml"))
    if n_steps is not None:
        spec = dataclasses.replace(
            spec, num_mpc_iter=min(n_steps, spec.num_mpc_iter))
    env = make_env(spec, params)
    dtype = jnp.float32

    ocp = make_ocp_data(spec, data, dtype)
    hyp = GPHyperArrays.from_spec(spec.gp, dtype)
    gp = agent_mod.init_gp_state(spec, env, dtype)
    eps = agent_mod.make_epistemic(jax.random.PRNGKey(spec.seed), spec,
                                   dtype)
    X, U = sqp.init_iterate(spec, dtype, data.start)
    x = jnp.asarray(data.start, dtype)
    ws = sqp.init_qp_ws(spec, dtype)
    wv = jnp.asarray(False)
    goal = jnp.asarray(data.goal, dtype)
    K_fb = (jnp.asarray(data.K_fb, dtype) if spec.use_feedback else None)

    probe = lambda gp_, Xt: (None, None)   # moments not needed here
    gaps, statuses = [], []
    for m in range(spec.num_mpc_iter):
        st, recs = sqp.solve_recorded(spec, env, hyp, ocp, x, X, U, gp,
                                      eps[m], ws, wv, probe_fn=probe)
        for r in recs:
            gaps.append(r["qp_gap"])
            statuses.append(r["qp_status"])
        X, U, gp = st.X, st.U, st.gp
        ws, wv = st.qp_ws, st.qp_valid
        u0 = U[0]
        if K_fb is not None:
            u0 = u0 - (goal - X[0, 0]) @ K_fb.T
        x = env.discrete_dyn(X[0, 0], u0).reshape(-1)
        if spec.shift_soln:
            X, U = shift_solution(spec, X, U)
    return np.asarray(gaps), np.asarray(statuses)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="*", default=[
        "params_pendulum1D_samples", "params_pendulum", "params_car"])
    ap.add_argument("--steps", type=int, default=None,
                    help="cap MPC steps per config")
    args = ap.parse_args()

    print(f"f32 tol={F32_TOL:g}, STATUS_RTOL band = (tol, 1e3*tol]",
          flush=True)
    total = np.zeros(len(BANDS) + 1, dtype=int)
    for config in args.configs:
        gaps, statuses = run_config(config, args.steps)
        consumed = statuses == 0
        ratio = gaps[consumed] / F32_TOL
        hist = np.zeros(len(BANDS) + 1, dtype=int)
        prev = 0.0
        for i, b in enumerate(BANDS):
            hist[i] = int(np.sum((ratio > prev) & (ratio <= b)))
            prev = b
        hist[-1] = int(np.sum(ratio > BANDS[-1]))
        total += hist
        labels = ["<=1x"] + [f"({a:g},{b:g}]x" for a, b in
                             zip((1, 3, 10, 100), BANDS[1:])] + [">1000x"]
        print(f"{config}: {consumed.sum()} consumed QPs "
              f"({(~consumed).sum()} rejected), max ratio "
              f"{ratio.max():.2f}x tol", flush=True)
        print("  " + "  ".join(f"{l}:{h}" for l, h in zip(labels, hist)),
              flush=True)
    print("TOTAL: " + " ".join(str(h) for h in total), flush=True)


if __name__ == "__main__":
    main()
