"""Forward-sampling reachability at scale (B2/B3 equivalent).

The reference runs 2500 SLURM jobs, each drawing ns=4000 GP dynamics
realizations on one GPU and propagating them under a saved input
trajectory (ref: benchmarking/simulate_forward_sampling_car.py,
benchmarking/euler_job.sh).  Here the realization axis is a sharded array
axis: one process sweeps `--repeats` seed blocks, each a single jitted
scan over the horizon with ns realizations sharded over every local
device.

Usage:
    python benchmarking/simulate_forward_sampling.py \
        -param params_car_residual_fs -i 0 --repeats 4 \
        [--data path/to/data.pkl]
"""

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-param", default="params_car_residual_fs")
    parser.add_argument("-i", type=int, default=0, help="seed block index")
    parser.add_argument("--repeats", type=int, default=1)
    parser.add_argument("--steps", type=int, default=None,
                        help="number of propagation steps (default "
                             "num_MPC_itrs)")
    parser.add_argument("--data", default=None,
                        help="data.pkl with the input trajectory to replay; "
                             "default: constant start-state inputs")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sampling_gpmpc_tpu import agent as agent_mod
    from sampling_gpmpc_tpu.config import load_problem
    from sampling_gpmpc_tpu.envs import make_env
    from sampling_gpmpc_tpu.gp.exact import GPHyperArrays
    from sampling_gpmpc_tpu.reachability import forward_sample_rollout
    from sampling_gpmpc_tpu.setup import default_dtype

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params, spec, data = load_problem(
        os.path.join(here, "params", args.param + ".yaml"))
    env = make_env(spec, params)
    dtype = default_dtype()
    hyp = GPHyperArrays.from_spec(spec.gp, dtype)

    T = args.steps or spec.num_mpc_iter
    if args.data:
        rec = pickle.load(open(args.data, "rb"))
        if len(rec["input_traj"]) == 1:
            # single solve: replay the full planned input sequence
            # (ref: simulate_forward_sampling_car.py:91-98)
            U = jnp.asarray(np.asarray(rec["input_traj"][0])[:T], dtype)
        else:
            # closed loop: replay the applied first inputs
            U = jnp.asarray(np.concatenate(
                [np.asarray(u)[:1] for u in rec["input_traj"]])[:T], dtype)
        T = U.shape[0]
    else:
        U = jnp.zeros((T, spec.nu), dtype)

    fb = None
    if spec.use_feedback and data.K_fb is not None:
        fb = {"K": data.K_fb, "x_eq": data.goal}

    gp0 = agent_mod.init_gp_state(spec, env, dtype, capacity=T)
    x0 = jnp.asarray(data.start, dtype)

    rollout = jax.jit(lambda gp, key: forward_sample_rollout(
        spec, env, hyp, gp, x0, U, key, use_feedback=fb)[0])

    out_dir = args.out or os.path.join(here, "experiments", "reachability",
                                       args.param)
    os.makedirs(out_dir, exist_ok=True)
    for r in range(args.repeats):
        key = jax.random.fold_in(jax.random.PRNGKey(spec.seed),
                                 args.i * 100003 + r)
        t0 = time.perf_counter()
        X = rollout(gp0, key)
        X.block_until_ready()
        dt = time.perf_counter() - t0
        fn = os.path.join(out_dir, f"data_X_traj_{args.i}_{r}.pkl")
        with open(fn, "wb") as f:
            pickle.dump({"X_traj": np.asarray(X), "seed_block": args.i,
                         "repeat": r, "wall_s": dt}, f)
        print(f"repeat {r}: {spec.ns} realizations x {T} steps in {dt:.3f}s "
              f"({spec.ns * T / dt:.0f} sampled steps/s) -> {fn}")


if __name__ == "__main__":
    main()
