"""Run the independent closed-loop oracle at the BASELINE flagship shapes
and store its trajectories (plus the shared epistemic draws) as committed
goldens for tests/test_oracle_parity.py's flagship tests.

Shapes (VERDICT r3 missing #2 / BASELINE):
  * pendulum1D ns=70, H=17, 20 MPC steps (full GP-sampling pipeline);
  * car-residual nominal solve at H=50 with 150 SQP iterations.

The oracle stack (torch-autograd kernel, NaN-row-removal GP, sparse-form
trust-constr QP) shares only the YAML config and epistemic draws with the
JAX framework — agreement is end-to-end independent evidence.
Run:  python benchmarking/run_flagship_oracle.py [pendulum|car]
"""
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "benchmarking"))

from sampling_gpmpc_tpu.setup import enable_x64, force_cpu_mesh  # noqa: E402

# the stored epistemic draws must be the f64 draws the TEST's jitted loop
# will regenerate under the suite conftest (same platform, same dtype) —
# f32 draws from the same key are different numbers
force_cpu_mesh(1)
enable_x64()

import dataclasses  # noqa: E402

import oracle_closed_loop as oc  # noqa: E402

from sampling_gpmpc_tpu.config import load_problem, make_data  # noqa: E402
from sampling_gpmpc_tpu.envs import make_env  # noqa: E402

OUT = os.path.join(HERE, "tests", "goldens")


def pendulum(ns=70, H=17, n_steps=20):
    import jax.numpy as jnp

    from sampling_gpmpc_tpu.dempc import DEMPC

    params, spec, data = load_problem(
        os.path.join(HERE, "params", "params_pendulum1D_samples.yaml"))
    spec = dataclasses.replace(spec, ns=ns, H=H, num_mpc_iter=n_steps)
    params["agent"]["num_dyn_samples"] = ns
    params["optimizer"]["H"] = H
    data = make_data(params, spec)
    env = make_env(spec, params)
    # the jitted loop only supplies the SHARED epistemic draws here; its
    # own trajectory is recomputed inside the test (fast) against this file
    mpc = DEMPC(params, spec, data, env, dtype=jnp.float64)
    eps = np.asarray(mpc.epistemic)
    t0 = time.time()
    out = oc.run_pendulum1d(params, spec, data, eps, n_steps)
    print(f"oracle pendulum1D ns={ns} H={H} {n_steps} steps: "
          f"{time.time()-t0:.1f}s")
    np.savez_compressed(
        os.path.join(OUT, "oracle_pendulum1d_flagship.npz"),
        eps=eps, physical_state_traj=out["physical_state_traj"],
        u0_traj=out["u0_traj"], final_state=out["final_state"],
        plan_X_traj=out["plan_X_traj"], plan_U_traj=out["plan_U_traj"],
        ns=ns, H=H, n_steps=n_steps)


def car(H=50, n_sqp=150):
    params, spec, data = load_problem(
        os.path.join(HERE, "params", "params_car_residual.yaml"))
    spec = dataclasses.replace(spec, H=H, max_sqp_iter=n_sqp)
    params["optimizer"]["H"] = H
    data = make_data(params, spec)
    t0 = time.time()
    out = oc.run_car_residual_true_dyn(params, spec, data, n_sqp)
    print(f"oracle car_residual H={H} {n_sqp} SQP iters: "
          f"{time.time()-t0:.1f}s")
    np.savez_compressed(
        os.path.join(OUT, "oracle_car_residual_flagship.npz"),
        X=out["X"], U=out["U"], H=H, n_sqp=n_sqp)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("pendulum", "both"):
        pendulum()
    if which in ("car", "both"):
        car()
