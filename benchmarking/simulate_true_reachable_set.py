"""Monte-Carlo ground-truth reachable set (B1 equivalent).

The reference replays a saved input trajectory 10000 times, each repeat
drawing ns fresh GP dynamics realizations with per-step iterative
conditioning (ref: benchmarking/simulate_true_reachable_set.py:118-259),
chunking results to pickles.  Here each repeat is one jitted scan and the
repeat axis is just a loop of PRNG folds; the realization axis stays a
device batch.

Usage:
    python benchmarking/simulate_true_reachable_set.py \
        -param params_pendulum1D_samples --repeats 100 --steps 17 \
        [--data path/to/data.pkl] [--chunk 25]
"""

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-param", default="params_pendulum1D_samples")
    parser.add_argument("--repeats", type=int, default=100)
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--chunk", type=int, default=25)
    parser.add_argument("--data", default=None)
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

    T = args.steps or spec.H
    if args.data:
        rec = pickle.load(open(args.data, "rb"))
        U = jnp.asarray(np.asarray(rec["input_traj"][0])[:T], dtype)
        T = U.shape[0]
    else:
        U = jnp.zeros((T, spec.nu), dtype)
    x0 = jnp.asarray(data.start, dtype)
    gp0 = agent_mod.init_gp_state(spec, env, dtype, capacity=T)

    # replay under the same ancillary feedback the plan assumed — without
    # it the MC tube is the OPEN-loop reachable set and not comparable to
    # the stabilized prediction fan (ref applies u = -K(x_eq-x)+u_ff,
    # simulate_forward_sampling_car.py:122)
    fb = ({"K": data.K_fb, "x_eq": data.goal}
          if spec.use_feedback and data.K_fb is not None else None)
    rollout = jax.jit(lambda key: forward_sample_rollout(
        spec, env, hyp, gp0, x0, U, key, use_feedback=fb)[0])

    out_dir = args.out or os.path.join(here, "experiments", "reachability",
                                       args.param + "_mc")
    os.makedirs(out_dir, exist_ok=True)
    base = jax.random.PRNGKey(spec.seed)
    chunk, n_chunks = [], 0
    t0 = time.perf_counter()
    for r in range(args.repeats):
        X = rollout(jax.random.fold_in(base, r))
        chunk.append(np.asarray(X))
        if len(chunk) >= args.chunk or r == args.repeats - 1:
            fn = os.path.join(out_dir, f"X_traj_list_{n_chunks}.pkl")
            with open(fn, "wb") as f:
                pickle.dump(np.stack(chunk), f)
            chunk, n_chunks = [], n_chunks + 1
    dt = time.perf_counter() - t0
    total = args.repeats * spec.ns
    print(f"{args.repeats} repeats x {spec.ns} realizations x {T} steps in "
          f"{dt:.1f}s ({total * T / dt:.0f} sampled steps/s) -> {out_dir}")


if __name__ == "__main__":
    main()
