"""Method-comparison figure (E9/B4-B6 aggregation).

Replaces the reference's paper-plotting scripts (ref: extra/cdc_plt.py,
plot_car_reachable_sets.py): overlays on one axis

  * the Monte-Carlo / forward-sampling hulls (ground truth, B1/B4),
  * the sampling method's per-stage hulls from a solved plan,
  * the linearization baseline's covariance ellipses (B5),
  * the robust-tube baseline's ellipsoids (B6),

computed from the artifacts the other benchmarking scripts write.

Usage (after running the other scripts; anything missing is skipped):
    python benchmarking/compare_methods.py -param params_car_residual \
        --mc-dir experiments/reachability/params_car_residual_fs \
        --out experiments/reachability/comparison.png
"""

import argparse
import glob
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib.patches import Ellipse  # noqa: E402


def draw_cov_ellipses(ax, means, covs, dims=(0, 1), n_std=2.0,
                      color="tab:orange", label=None):
    for k in range(0, means.shape[0]):
        c = means[k][list(dims)]
        Q = covs[k][np.ix_(dims, dims)]
        if np.trace(Q) < 1e-14:
            continue
        w, V = np.linalg.eigh(Q)
        ang = np.degrees(np.arctan2(V[1, 0], V[0, 0]))
        ax.add_patch(Ellipse(c, 2 * n_std * np.sqrt(max(w[0], 0)),
                             2 * n_std * np.sqrt(max(w[1], 0)), angle=ang,
                             fill=False, edgecolor=color, alpha=0.7,
                             label=label if k == 0 else None))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-param", default="params_car_residual")
    parser.add_argument("--mc-dir", default=None)
    parser.add_argument("--lin", default=None)
    parser.add_argument("--tube", default=None)
    parser.add_argument("--dims", type=int, nargs=2, default=[0, 1])
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rdir = os.path.join(here, "experiments", "reachability")
    mc_dir = args.mc_dir or os.path.join(rdir, args.param + "_fs")
    lin = args.lin or os.path.join(rdir, f"{args.param}_linearization.pkl")
    tube = args.tube or os.path.join(rdir, f"{args.param}_robust_tube.pkl")
    dims = tuple(args.dims)

    fig, ax = plt.subplots(figsize=(10, 5))
    plotted = []

    files = sorted(glob.glob(os.path.join(mc_dir, "data_X_traj_*.pkl"))) + \
        sorted(glob.glob(os.path.join(mc_dir, "X_traj_list_*.pkl")))
    if files:
        from benchmarking.generate_convex_hull import stage_hulls
        blocks = []
        for fn in files[:20]:
            with open(fn, "rb") as f:
                d = pickle.load(f)
            X = d["X_traj"] if isinstance(d, dict) else d.reshape(
                -1, *d.shape[-2:])
            blocks.append(np.transpose(np.asarray(X), (1, 0, 2))
                          if X.ndim == 3 else X)
        trajs = np.concatenate(blocks, axis=0)
        hulls = stage_hulls(trajs, dims=dims)
        for k, h in enumerate(hulls):
            if len(h) >= 3:
                ax.fill(h[:, 0], h[:, 1], alpha=0.25, color="tab:blue",
                        label="sampling hulls" if k == 0 else None)
        plotted.append("sampling hulls")

    if os.path.exists(lin):
        d = pickle.load(open(lin, "rb"))
        draw_cov_ellipses(ax, d["means"], d["covs"], dims=dims,
                          color="tab:orange", label="linearization 2σ")
        ax.plot(d["means"][:, dims[0]], d["means"][:, dims[1]],
                color="tab:orange", lw=1)
        plotted.append("linearization")

    if os.path.exists(tube):
        d = pickle.load(open(tube, "rb"))
        draw_cov_ellipses(ax, d["centers"], d["shapes"], dims=dims, n_std=1.0,
                          color="tab:red", label="robust tube")
        plotted.append("robust tube")

    ax.set_xlabel(f"x[{dims[0]}]")
    ax.set_ylabel(f"x[{dims[1]}]")
    ax.legend(loc="best", fontsize=8)
    out = args.out or os.path.join(rdir, f"{args.param}_comparison.png")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    fig.savefig(out, dpi=200, bbox_inches="tight")
    print(f"plotted: {plotted} -> {out}")


if __name__ == "__main__":
    main()
