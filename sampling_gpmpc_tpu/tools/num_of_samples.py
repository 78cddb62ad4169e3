"""Sample-count calculator: how many GP dynamics samples does safety need?

End-to-end re-derivation of the reference's epsilon(N) workflow
(ref: extra/compute_num_samples/num_of_samples.py:1-73,
plot_SMP_eps.py:68-106) on the JAX GP core:

1. C_D — the change-of-measure exponent between the posterior-mean-centered
   GP and the true function (true RKHS norm from a 10x-denser grid of the
   same analytic prior, num_of_samples.py:31-37).
2. B_phi(N_grid) — Monte-Carlo small-ball probability that a posterior draw
   stays within ``dyn_eps`` of the mean uniformly over an N_grid^D grid of
   the GP input box, swept over eps offsets (plot_SMP_eps.py:68-88).
3. eps(N_grid, p) — the deviation quantile achieving ball-probability p
   (helper.py:368-469, plot_SMP_eps.py:90-106).
4. N(delta) = log(delta) / log(1 - exp(-C_D) B_phi) — the headline count
   (num_of_samples.py:69).

Run:  python -m sampling_gpmpc_tpu.tools.num_of_samples \
          -param params_pendulum1D_samples [--out figures/]
"""

from __future__ import annotations

import argparse
import copy
import os

import jax
import numpy as np

from sampling_gpmpc_tpu.tools import sample_complexity as sc


def _train_values(params, spec, gp_idx: int):
    """(Z, y): training inputs + VALUE observations of output ``gp_idx``."""
    from sampling_gpmpc_tpu.envs import make_env
    env = make_env(spec, params)
    X, Y = env.training_grid()
    return np.asarray(X), np.asarray(Y[gp_idx, :, 0])


def _dense_params(params, factor: int = 10):
    dense = copy.deepcopy(params)
    dense["env"]["n_data_x"] *= factor
    dense["env"]["n_data_u"] *= factor
    return dense


def run(params, spec, data, gp_idx: int = 0, delta: float = 0.001,
        n_grid_max: int = 8, n_mc: int = 200_000, dense_factor: int = 10,
        eps_offsets=(-2e-4, 0.0, 2e-4), probs=(0.5, 0.7, 0.9),
        seed: int = 0) -> dict:
    """Full pipeline for one config; returns every curve and the final N."""
    from sampling_gpmpc_tpu.config import make_spec

    hyp = spec.gp
    ls = np.asarray(hyp.lengthscale[gp_idx])
    os_ = float(hyp.outputscale[gp_idx])
    lam = float(hyp.noise)
    lam_total = lam + float(hyp.task_noises[0])
    tight = params["agent"]["tight"]
    w_bound = float(tight.get("w_bound", 0.0))
    dyn_eps = float(tight.get("dyn_eps", 0.0))

    Z, y = _train_values(params, spec, gp_idx)
    dense = _dense_params(params, dense_factor)
    Z_dense, y_dense = _train_values(dense, make_spec(dense), gp_idx)

    cd = sc.change_of_measure_cd(Z, y, Z_dense, y_dense, ls, os_, lam,
                                 lam_total, w_bound)
    beta = sc.info_beta(Z, ls, os_, lam)

    key = jax.random.PRNGKey(seed)
    grids = list(range(1, n_grid_max + 1))
    # one deviation draw per grid size, reused across the eps sweep and the
    # quantile curves (the reference redraws 1e6 samples per (eps, N) cell;
    # the sweep only needs the order statistics of ONE draw per N)
    devs = {}
    for n in grids:
        grid = sc.gp_input_grid(spec, data, n)
        devs[n] = sc.max_deviation_samples_chunked(
            Z, y, grid, ls, os_, lam, n_mc, jax.random.fold_in(key, n))

    b_phi = {off: [float(np.mean(devs[n] <= dyn_eps + off)) for n in grids]
             for off in eps_offsets}
    eps_curves = {p: [float(np.quantile(devs[n], p)) for n in grids]
                  for p in probs}

    # the headline N(delta) uses the small-ball probability AT dyn_eps
    # itself (offset 0), independent of which sweep offsets were requested
    p_ball = float(np.mean(devs[grids[-1]] <= dyn_eps))
    n_req = sc.num_samples_with_measure_shift(cd["Cd"], p_ball, delta)
    return {"grids": grids, "b_phi": b_phi, "eps_curves": eps_curves,
            "Cd": cd, "beta": beta, "p_ball": p_ball, "delta": delta,
            "dyn_eps": dyn_eps, "num_samples": n_req}


def plot(result: dict, out_dir: str) -> list:
    """The two sweep figures of plot_SMP_eps.py (B_phi vs N; eps vs N)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    fig, ax = plt.subplots(figsize=(5, 3.4))
    for off, curve in result["b_phi"].items():
        ax.plot(result["grids"], curve, marker="o",
                label=f"eps = {result['dyn_eps'] + off:.4g}")
    ax.set_xlabel("grid points per dim N")
    ax.set_ylabel(r"small-ball probability $B_\phi$")
    ax.legend(fontsize=7)
    fig.tight_layout()
    p = os.path.join(out_dir, "smb_vs_N.png")
    fig.savefig(p, dpi=150)
    plt.close(fig)
    paths.append(p)

    fig, ax = plt.subplots(figsize=(5, 3.4))
    for prob, curve in result["eps_curves"].items():
        ax.plot(result["grids"], curve, marker="o", label=f"p = {prob}")
    ax.set_xlabel("grid points per dim N")
    ax.set_ylabel(r"$\epsilon(N)$ deviation quantile")
    ax.legend(fontsize=7)
    fig.tight_layout()
    p = os.path.join(out_dir, "eps_vs_N.png")
    fig.savefig(p, dpi=150)
    plt.close(fig)
    paths.append(p)
    return paths


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-param", default="params_pendulum1D_samples")
    ap.add_argument("--out", default="figures")
    ap.add_argument("--n-mc", type=int, default=200_000)
    ap.add_argument("--delta", type=float, default=0.001)
    args = ap.parse_args()

    from sampling_gpmpc_tpu.config import load_problem
    from sampling_gpmpc_tpu.setup import enable_x64
    enable_x64()   # the measure-shift terms are exp-of-norms; keep them f64
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    params, spec, data = load_problem(
        os.path.join(here, "params", args.param + ".yaml"))
    res = run(params, spec, data, n_mc=args.n_mc, delta=args.delta)
    cd = res["Cd"]
    print(f"RKHS ||mu||^2 = {cd['mean_norm']:.4f}  ||f||^2(dense) = "
          f"{cd['true_norm']:.4f}  beta = {res['beta']:.3f}")
    print(f"C_D = {cd['Cd']:.4f}  (fit {cd['fit_term']:.4f}, "
          f"|alpha|_1 w = {cd['alpha_l1']:.3f} * w_bound)")
    print(f"B_phi(eps={res['dyn_eps']:.4g}, N={res['grids'][-1]}) = "
          f"{res['p_ball']:.4f}")
    print(f"N({args.delta}) = {res['num_samples']:.1f} dynamics samples")
    for p in plot(res, args.out):
        print(f"figure: {p}")


if __name__ == "__main__":
    main()
