"""Robust-tube GP-MPC baseline (B6): Koller one-step ellipsoidal reachability.

TPU-native re-implementation of the machinery the reference pulls from the
external safe-exploration repo (``onestep_reachability``,
ref: benchmarking/robust_tube_based_GPMPC_koller.py:27-28,295-307) — the
outer-ellipsoid propagation of Koller et al. 2018 ("Learning-based MPC for
safe exploration"):

For the tube E_k = {x : (x-c)' Q^{-1} (x-c) <= 1} under ancillary feedback
``u = u_ff + k_fb (c - x_equi)`` (ref script :276-279):

    z_bar  = (c, u_eff)                      linearization point
    c+     = mu(z_bar)                       posterior-mean dynamics
    A_cl   = d mu/dx + d mu/du @ k_fb        closed-loop Jacobian
    r      = sup_{x in E_k} ||(x-c, k_fb(x-c))||        joint deviation
    b_lin  = 0.5 * l_mu * r^2                Taylor remainder, per dim
    b_sig  = beta * (sigma(z_bar) + l_sigma * r)        GP confidence on E_k
    Q+     = mink(A_cl Q A_cl', nx * diag((b_lin+b_sig)^2))

with per-dimension Lipschitz constants l_mu (of the mean Jacobian) and
l_sigma (of the posterior std) estimated from the recorded trajectory by
the pairwise-ratio estimator (ref script :35-44,202-236), and the
Minkowski sum outer-bounded by the standard trace scaling.

Writes the same four overlay artifacts as the reference script
(:313-325): koller_ellipse_data.pkl (per-stage (2,100) polylines),
koller_ellipse_center_data.pkl, koller_mean_data.pkl,
koller_true_data.pkl — consumed by ``visu_main.py --plot-koller``
(ref: visu_main.py:79-85,145-151).

Usage:
    python benchmarking/robust_tube_baseline.py -param params_car_residual \
        -i 42 [--steps 30] [--no-feedback]
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def minkowski_ellipsoid(Q1, Q2, eps=1e-12):
    """Outer ellipsoid of E(Q1) + E(Q2): (1+1/p) Q1 + (1+p) Q2 with the
    trace-optimal p = sqrt(tr Q2 / tr Q1)."""
    import jax.numpy as jnp

    t1 = jnp.trace(Q1)
    t2 = jnp.trace(Q2)
    p = jnp.sqrt((t2 + eps) / (t1 + eps))
    Q_sum = (1.0 + 1.0 / p) * Q1 + (1.0 + p) * Q2
    Q_sum = jnp.where(t1 <= eps, Q2, Q_sum)
    return jnp.where(t2 <= eps, Q1, Q_sum)


def mean_dyn_and_sigma(spec, env, hyp, Z, Y, xu):
    """Posterior-mean dynamics value+Jacobian and full-state std at one point.

    Returns (comb (nx, 1+nx+nu), sigma (nx,)): the derivative-GP posterior
    mean of the gradient tasks IS the gradient of the posterior mean, so
    ``assemble_val_jac`` on the mean rows gives the exact closed-form
    Jacobian the reference gets from torch autograd (:243-246)."""
    import jax
    import jax.numpy as jnp

    from sampling_gpmpc_tpu import agent as agent_mod

    Xt = xu[jnp.asarray(spec.g_idx_inputs)][None]
    _, mean, cov = agent_mod._batched_posterior(spec, hyp, Z[:1], Y[:1],
                                                Xt[None])
    rows = mean[0].reshape(spec.g_ny, spec.Ty)
    var = jax.vmap(jnp.diagonal)(cov[0]).reshape(spec.g_ny, spec.Ty)
    comb = env.assemble_val_jac(xu, rows)
    Bd = env.B_d_dyn(xu)
    sig_g = jnp.sqrt(jnp.clip(var[:, 0], 0.0))
    sigma = jnp.sqrt(jnp.clip(jnp.diag(Bd @ jnp.diag(sig_g * sig_g) @ Bd.T),
                              0.0))
    return comb, sigma


def pairwise_lipschitz(x_grid, f_grid):
    """max over pairs of ||f_a - f_b|| / ||x_a - x_b|| (ref script :35-44)."""
    import jax.numpy as jnp

    dx = jnp.linalg.norm(x_grid[:, None, :] - x_grid[None, :, :], axis=-1)
    f = f_grid.reshape(f_grid.shape[0], -1)
    df = jnp.linalg.norm(f[:, None, :] - f[None, :, :], axis=-1)
    return jnp.max(df / (dx + 1e-6))


def estimate_lipschitz_from_traj(spec, env, hyp, Z, Y, X_traj, U_traj):
    """Per-state-dim l_mu (of the mean Jacobian) and l_sigma (of sigma)
    over the recorded trajectory grid (ref script :202-236)."""
    import jax
    import jax.numpy as jnp

    xu = jnp.concatenate([X_traj[:-1], U_traj], axis=-1)
    comb, sigma = jax.vmap(
        lambda z: mean_dyn_and_sigma(spec, env, hyp, Z, Y, z))(xu)
    jac = comb[:, :, 1:]                       # (T, nx, nx+nu)
    l_mu = jax.vmap(lambda j: pairwise_lipschitz(X_traj[:-1], j),
                    in_axes=1)(jac)
    l_sig = jax.vmap(lambda s: pairwise_lipschitz(X_traj[:-1], s[:, None]),
                     in_axes=1)(sigma)
    return jnp.maximum(l_mu, 1e-6), jnp.maximum(l_sig, 1e-6)


def propagate_tube(spec, env, hyp, gp, x0, U, k_fb, x_equi, l_mu, l_sig,
                   beta):
    """Koller one-step recursion over the horizon.

    Returns centers (T+1, nx), shapes Q (T+1, nx, nx), mean values (T, nx).
    """
    import jax
    import jax.numpy as jnp

    from sampling_gpmpc_tpu import agent as agent_mod

    nx = spec.nx
    dtype = U.dtype
    Z, Y = agent_mod.full_train_set(spec, gp)
    K = jnp.asarray(k_fb, dtype)

    def step(carry, u_ff):
        c, Q = carry
        u_eff = u_ff + K @ (c - x_equi)
        xu = jnp.concatenate([c, u_eff])
        comb, sigma = mean_dyn_and_sigma(spec, env, hyp, Z, Y, xu)
        c_next = comb[:, 0]
        A_x = comb[:, 1:1 + nx]
        A_u = comb[:, 1 + nx:]
        A_cl = A_x + A_u @ K

        # joint (x, u) deviation radius over E(Q) under the feedback
        lam_x = jnp.linalg.norm(Q, ord=2)
        lam_u = jnp.linalg.norm(K @ Q @ K.T, ord=2)
        r = jnp.sqrt(jnp.clip(lam_x + lam_u, 0.0))

        b_lin = 0.5 * l_mu * r * r
        b_sig = beta * (sigma + l_sig * r)
        b = b_lin + b_sig
        Q_lin = A_cl @ Q @ A_cl.T
        Q_err = nx * jnp.diag(b * b)
        Q_next = minkowski_ellipsoid(Q_lin, Q_err)
        # the Koller recursion EXPLODES on long horizons (the comparison
        # point of the papers); once non-finite, freeze the last finite
        # tube exactly like the reference's NaN guard
        # (ref script :288-292 reuses ellipse_list[-1] on NaN)
        ok = jnp.all(jnp.isfinite(Q_next)) & jnp.all(jnp.isfinite(c_next))
        Q_next = jnp.where(ok, Q_next, Q)
        c_next = jnp.where(ok, c_next, c)
        return (c_next, Q_next), (c_next, Q_next, c_next)

    Q0 = jnp.zeros((nx, nx), dtype)
    (_, _), (cs, Qs, means) = jax.lax.scan(step, (x0, Q0), U)
    cs = jnp.concatenate([x0[None], cs])
    Qs = jnp.concatenate([Q0[None], Qs])
    return cs, Qs, means


def ellipse_polyline(c, Q, dims=(0, 1), n=100):
    """(2, n) boundary polyline of the ellipsoid slice in plot dims
    (ref script :307-312 draws chol(Q)' applied to the unit circle)."""
    import numpy as np

    Qp = np.asarray(Q)[np.ix_(dims, dims)]
    w, V = np.linalg.eigh(Qp)
    R = V * np.sqrt(np.clip(w, 0.0, None))[None, :]
    t = np.linspace(0, 2 * np.pi, n)
    z = np.stack([np.cos(t), np.sin(t)])
    return R @ z + np.asarray(c)[list(dims)].reshape(-1, 1)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-param", default="params_car_residual")
    parser.add_argument("-env", type=int, default=0)
    parser.add_argument("-i", type=int, default=None,
                        help="run index: read the artifact + write the "
                             "koller_*.pkl overlays next to it")
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--data", default=None)
    parser.add_argument("--no-feedback", action="store_true")
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

    run_dir = None
    data_path = args.data
    if args.i is not None:
        run_dir = os.path.join(here, "experiments",
                               params["experiment"]["folder"],
                               f"env_{args.env}", args.param, str(args.i))
        data_path = data_path or os.path.join(run_dir, "data.pkl")

    X_traj = None
    if data_path and os.path.exists(data_path):
        rec = pickle.load(open(data_path, "rb"))
        U = jnp.asarray(np.concatenate(
            [np.asarray(u)[:1] for u in rec["input_traj"]])[:args.steps],
            dtype)
        X_traj = jnp.asarray(np.asarray(
            rec["physical_state_traj"])[:args.steps + 1, :spec.nx], dtype)
    else:
        U = jnp.zeros((args.steps, spec.nu), dtype)
    x0 = jnp.asarray(data.start, dtype)
    T = U.shape[0]

    if args.no_feedback or data.K_fb is None:
        k_fb = np.zeros((spec.nu, spec.nx))
    else:
        # config convention u = -K(x_eq - x) = K(x - x_eq)
        k_fb = np.asarray(data.K_fb)
    x_equi = jnp.asarray(data.goal, dtype)

    Z, Y = agent_mod.full_train_set(spec, gp)
    if X_traj is not None and X_traj.shape[0] > 2:
        l_mu, l_sig = jax.jit(lambda X, Uu: estimate_lipschitz_from_traj(
            spec, env, hyp, Z, Y, X, Uu))(X_traj, U[:X_traj.shape[0] - 1])
    else:
        l_mu = jnp.full((spec.nx,), 0.1, dtype)
        l_sig = jnp.full((spec.nx,), 0.1, dtype)

    cs, Qs, means = jax.jit(lambda x0, U: propagate_tube(
        spec, env, hyp, gp, x0, U, k_fb, x_equi, l_mu, l_sig,
        spec.gp.beta))(x0, U)
    cs, Qs, means = map(np.asarray, (cs, Qs, means))

    # true-dynamics rollout along the same inputs+feedback for the overlay
    # — one jitted scan, not T eager steps (each eager op pays a relay
    # round trip on the TPU; same fix as DEMPC's record rollouts)
    K_j = jnp.asarray(k_fb, dtype)

    def _true_step(x, u):
        xn = env.discrete_dyn(x, u + K_j @ (x - x_equi)).reshape(-1)
        return xn, xn

    _, true_roll = jax.jit(lambda x0_, U_: jax.lax.scan(
        _true_step, x0_, U_))(jnp.asarray(x0, dtype), U[:T])
    true_list = [np.asarray(x0)] + [np.asarray(r) for r in true_roll]

    out_dir = (run_dir if run_dir is not None else
               (args.out or os.path.join(here, "experiments",
                                         "reachability")))
    os.makedirs(out_dir, exist_ok=True)
    ellipses = [ellipse_polyline(cs[t], Qs[t]) for t in range(1, T + 1)]
    with open(os.path.join(out_dir, "koller_ellipse_data.pkl"), "wb") as f:
        pickle.dump(ellipses, f)
    with open(os.path.join(out_dir, "koller_ellipse_center_data.pkl"),
              "wb") as f:
        pickle.dump([cs[t].reshape(-1, 1) for t in range(1, T + 1)], f)
    with open(os.path.join(out_dir, "koller_mean_data.pkl"), "wb") as f:
        pickle.dump([m.reshape(-1, 1) for m in means], f)
    with open(os.path.join(out_dir, "koller_true_data.pkl"), "wb") as f:
        pickle.dump([x.reshape(-1, 1) for x in true_list[1:]], f)

    print(f"l_mu = {np.asarray(l_mu)}")
    print(f"l_sigma = {np.asarray(l_sig)}")
    print(f"propagated {T} stages -> {out_dir}/koller_*.pkl")
    print("final center:", cs[-1])
    print("final tube radii:", np.sqrt(np.abs(np.diag(Qs[-1]))))


if __name__ == "__main__":
    main()
