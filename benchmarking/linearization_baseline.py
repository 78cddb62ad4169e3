"""Linearization-based (Cautious-MPC style) uncertainty propagation (B5).

Propagates mean and covariance ellipses of the GP dynamics along an input
trajectory:  mu+ = f(mu, u) + B_d g_mean(mu, u),
             P+  = A P A' + B_d Sigma(mu, u) B_d',
with A the posterior-mean Jacobian — obtained directly from the derivative
GP's mean tasks instead of the reference's autograd pass
(ref: benchmarking/linearization_based_predictions.py:136-179).

Usage:
    python benchmarking/linearization_baseline.py -param params_car_residual \
        [--data path/to/data.pkl] [--steps 30]
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def propagate(spec, env, hyp, gp, x0, U):
    """Returns means (T+1, nx) and covariances (T+1, nx, nx)."""
    import jax
    import jax.numpy as jnp

    from sampling_gpmpc_tpu import agent as agent_mod

    dtype = U.dtype
    nx = spec.nx
    Z, Y = agent_mod.full_train_set(spec, gp)

    def step(carry, u):
        mu, P = carry
        xu = jnp.concatenate([mu, u])
        Xt = xu[jnp.asarray(spec.g_idx_inputs)][None]          # (1, D)
        # posterior at the mean point: (ns=1, g_ny) batches
        fact, mean, cov = agent_mod._batched_posterior(
            spec, hyp, Z[:1], Y[:1], Xt[None])
        rows = mean[0].reshape(spec.g_ny, spec.Ty)             # mean + grads
        var = jax.vmap(jnp.diagonal)(cov[0]).reshape(spec.g_ny, spec.Ty)

        comb = env.assemble_val_jac(xu, rows)                  # (nx, 1+nx+nu)
        mu_next = comb[:, 0]
        A = comb[:, 1:1 + nx]
        Bd = env.B_d_dyn(xu)
        Sigma = jnp.diag(var[:, 0])
        P_next = A @ P @ A.T + Bd @ Sigma @ Bd.T
        return (mu_next, P_next), (mu_next, P_next)

    P0 = jnp.zeros((nx, nx), dtype)
    (_, _), (mus, Ps) = jax.lax.scan(step, (x0, P0), U)
    mus = jnp.concatenate([x0[None], mus])
    Ps = jnp.concatenate([P0[None], Ps])
    return mus, Ps


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-param", default="params_car_residual")
    parser.add_argument("--data", default=None)
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sampling_gpmpc_tpu import agent as agent_mod
    from sampling_gpmpc_tpu.config import load_problem
    from sampling_gpmpc_tpu.envs import make_env
    from sampling_gpmpc_tpu.gp.exact import GPHyperArrays
    from sampling_gpmpc_tpu.setup import default_dtype

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params, spec, data = load_problem(
        os.path.join(here, "params", args.param + ".yaml"))
    import dataclasses
    spec = dataclasses.replace(spec, ns=1)
    params["agent"]["num_dyn_samples"] = 1
    env = make_env(spec, params)
    dtype = default_dtype()
    hyp = GPHyperArrays.from_spec(spec.gp, dtype)
    gp = agent_mod.init_gp_state(spec, env, dtype, capacity=1)

    if args.data:
        rec = pickle.load(open(args.data, "rb"))
        U = jnp.asarray(np.concatenate(
            [np.asarray(u)[:1] for u in rec["input_traj"]])[:args.steps],
            dtype)
    else:
        U = jnp.zeros((args.steps, spec.nu), dtype)
    x0 = jnp.asarray(data.start, dtype)

    mus, Ps = jax.jit(lambda x0, U: propagate(spec, env, hyp, gp, x0, U))(
        x0, U)
    out = args.out or os.path.join(here, "experiments", "reachability",
                                   f"{args.param}_linearization.pkl")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "wb") as f:
        pickle.dump({"means": np.asarray(mus), "covs": np.asarray(Ps)}, f)
    print(f"propagated {args.steps} stages -> {out}")
    print("final mean:", np.asarray(mus[-1]))
    print("final cov diag:", np.asarray(jnp.diagonal(Ps[-1])))


if __name__ == "__main__":
    main()
