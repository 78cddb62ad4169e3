"""Golden closed-loop trajectories: generation + comparison.

The parity answer this image can give (BASELINE "match the reference
closed loop to 1e-3"; acados itself is absent): every flagship config runs
FULL LENGTH in deterministic f64 on the host CPU, and the resulting
trajectories are committed as goldens (``tests/goldens/*.npz``) pinned by
regression tests to ~1e-8.  Any numerical change after any MPC step is
visible to the suite — the committed goldens are also the trajectories a
reference run can be diffed against the moment acados is available
(``benchmarking/compare_vs_reference.py``).

Flagship set (SURVEY §2.1 workload table; full reference lengths):

- params_pendulum1D_samples  ns=70,  H=17, 55 MPC steps
- params_pendulum            ns=20,  H=30, 40 MPC steps
- params_car                 ns=20,  H=15, 130 MPC steps
- params_car_residual        ns=1,   H=50, 1 step x 150 SQP iters
                             (true-dyn debug run, ref: src/DEMPC.py:39-80,
                              params/params_car_residual.yaml:47-50)

Regenerate with:  python -m sampling_gpmpc_tpu.tools.goldens
(on the host CPU; the module forces the f64 CPU platform itself).
"""

from __future__ import annotations

import os

import numpy as np

GOLDEN_CONFIGS = (
    "params_pendulum1D_samples",
    "params_pendulum",
    "params_car",
    "params_car_residual",
    # ns=500 one-step reachable-set workload (QP row-path stress: 1000
    # state-box rows at H=1; ref: params/params_pendulum_samples.yaml:38,
    # one-step planner src/DEMPC.py:82-112)
    "params_pendulum_samples",
    # H=100: the deepest published condensing/QP horizon — pins the
    # associative-scan condensing + QP row path at depth 100 (VERDICT r3
    # missing #3; ref: params/params_car_samples.yaml:67)
    "params_car_samples",
)

# pin tolerance: f64 closed loops on one platform are reproducible to
# roundoff; 1e-8 leaves headroom for BLAS/XLA version drift while still
# catching any real numerical regression
GOLDEN_ATOL = 1e-8


def repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def golden_path(config: str) -> str:
    return os.path.join(repo_root(), "tests", "goldens", config + ".npz")


def run_closed_loop(config: str) -> dict:
    """Run one flagship config full-length; return the pinnable arrays.

    Must be called with the f64 CPU platform active (tests/conftest.py or
    :func:`main`) — goldens are generated and checked on the same
    deterministic platform.
    """
    import jax.numpy as jnp

    from sampling_gpmpc_tpu.config import load_problem
    from sampling_gpmpc_tpu.dempc import DEMPC
    from sampling_gpmpc_tpu.envs import make_env

    cfg = os.path.join(repo_root(), "params", config + ".yaml")
    params, spec, data = load_problem(cfg)
    env = make_env(spec, params)
    mpc = DEMPC(params, spec, data, env, dtype=jnp.float64)
    out = mpc.run()
    return {
        "physical_state_traj": np.stack(out["physical_state_traj"]),
        "final_state": np.asarray(out["final_state"]),
        # applied input of every step (what the plant saw, before feedback)
        "u0_traj": np.stack([u[0] for u in out["input_traj"]]),
        # last step's full plan: pins the SQP fixed point itself
        "last_plan_X": np.asarray(out["state_traj"][-1]),
        "last_plan_U": np.asarray(out["input_traj"][-1]),
    }


def save_golden(config: str, arrays: dict) -> str:
    path = golden_path(config)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **arrays)
    return path


def load_golden(config: str) -> dict:
    with np.load(golden_path(config)) as z:
        return {k: z[k] for k in z.files}


def main() -> None:
    os.environ["SGPMPC_DTYPE"] = "float64"
    from sampling_gpmpc_tpu.setup import enable_x64, force_cpu_mesh
    force_cpu_mesh(8)   # same virtual mesh as tests/conftest.py
    enable_x64()

    import time
    for config in GOLDEN_CONFIGS:
        t0 = time.perf_counter()
        arrays = run_closed_loop(config)
        path = save_golden(config, arrays)
        print(f"{config}: {arrays['physical_state_traj'].shape[0]} steps, "
              f"final {np.round(arrays['final_state'], 6)} "
              f"({time.perf_counter() - t0:.1f}s) -> {path}")


if __name__ == "__main__":
    main()
