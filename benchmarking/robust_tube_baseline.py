"""Robust-tube GP-MPC baseline: one-step ellipsoidal over-approximation (B6).

Self-contained TPU-native stand-in for the reference's wrapper around the
external safe-exploration (Koller et al. 2018) repo
(ref: benchmarking/robust_tube_based_GPMPC_koller.py): propagates outer
ellipsoids {x : (x-c)' Q^-1 (x-c) <= 1} through the GP dynamics,

    c+     = mu(c, u)
    Q_lin  = A Q A'                         (linear part)
    d      = beta * sigma(c, u) + 0.5 * L_f * r^2   (per-dim error bound:
             GP confidence + Lipschitz linearization remainder)
    Q+     = minkowski_ellipsoid(Q_lin, diag(d^2) * nx)

with r the radius of E_k and the Minkowski sum of two ellipsoids outer-
bounded by the standard p-scaling  Q_s = (1+1/p) Q1 + (1+p) Q2,
p = sqrt(tr Q2 / tr Q1).

Usage:
    python benchmarking/robust_tube_baseline.py -param params_car_residual \
        [--steps 30] [--data path/to/data.pkl]
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def minkowski_ellipsoid(Q1, Q2, eps=1e-12):
    import jax.numpy as jnp

    t1 = jnp.trace(Q1)
    t2 = jnp.trace(Q2)
    p = jnp.sqrt((t2 + eps) / (t1 + eps))
    Q_sum = (1.0 + 1.0 / p) * Q1 + (1.0 + p) * Q2
    # degenerate partners: the sum collapses to the other ellipsoid
    Q_sum = jnp.where(t1 <= eps, Q2, Q_sum)
    return jnp.where(t2 <= eps, Q1, Q_sum)


def propagate_tube(spec, env, hyp, gp, x0, U, lipschitz_hess: float,
                   beta: float):
    """Returns centers (T+1, nx) and shape matrices Q (T+1, nx, nx)."""
    import jax
    import jax.numpy as jnp

    from sampling_gpmpc_tpu import agent as agent_mod

    nx = spec.nx
    dtype = U.dtype
    Z, Y = agent_mod.full_train_set(spec, gp)

    def step(carry, u):
        c, Q = carry
        xu = jnp.concatenate([c, u])
        Xt = xu[jnp.asarray(spec.g_idx_inputs)][None]
        fact, mean, cov = agent_mod._batched_posterior(
            spec, hyp, Z[:1], Y[:1], Xt[None])
        rows = mean[0].reshape(spec.g_ny, spec.Ty)
        var = jax.vmap(jnp.diagonal)(cov[0]).reshape(spec.g_ny, spec.Ty)

        comb = env.assemble_val_jac(xu, rows)
        c_next = comb[:, 0]
        A = comb[:, 1:1 + nx]
        Bd = env.B_d_dyn(xu)
        sigma = jnp.sqrt(jnp.clip(var[:, 0], 0.0))

        Q_lin = A @ Q @ A.T
        r2 = jnp.linalg.norm(Q, ord=2)            # sup ||x - c||^2 over E
        d = jnp.abs(Bd) @ (beta * sigma) + 0.5 * lipschitz_hess * r2
        Q_err = nx * jnp.diag(d * d)
        Q_next = minkowski_ellipsoid(Q_lin, Q_err)
        return (c_next, Q_next), (c_next, Q_next)

    Q0 = jnp.zeros((nx, nx), dtype)
    (_, _), (cs, Qs) = jax.lax.scan(step, (x0, Q0), U)
    cs = jnp.concatenate([x0[None], cs])
    Qs = jnp.concatenate([Q0[None], Qs])
    return cs, Qs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-param", default="params_car_residual")
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--data", default=None)
    parser.add_argument("--lipschitz-hess", type=float, default=0.1)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    import dataclasses

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

    cs, Qs = jax.jit(lambda x0, U: propagate_tube(
        spec, env, hyp, gp, x0, U, args.lipschitz_hess,
        spec.gp.beta))(x0, U)
    out = args.out or os.path.join(here, "experiments", "reachability",
                                   f"{args.param}_robust_tube.pkl")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "wb") as f:
        pickle.dump({"centers": np.asarray(cs), "shapes": np.asarray(Qs)}, f)
    print(f"propagated {args.steps} stages -> {out}")
    print("final center:", np.asarray(cs[-1]))
    print("final tube radii:", np.sqrt(np.abs(np.diag(np.asarray(Qs[-1])))))


if __name__ == "__main__":
    main()
