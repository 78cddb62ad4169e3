"""Paper-format phase-plane figure (E9): CDC-style pendulum overlay.

Re-creation of the reference's CDC-2024 figure pipeline
(ref: extra/cdc_plt.py:115-226): on one serif, cm-sized phase-plane axis

  * the TRUE uncertainty region — the union, over stages, of convex hulls
    of Monte-Carlo GP rollouts (``X_traj_list_*.pkl`` chunks written by
    ``simulate_true_reachable_set.py``), shaded and stage-interpolated the
    way the reference fills consecutive-stage hulls (cdc_plt.py:188-202),
  * the sampling-MPC prediction — per-stage convex-hull outlines of the
    ns-sample fan from the solved plan's first MPC step
    (cdc_plt.py:209-226),
  * the executed closed-loop trajectory.

The reference script leans on an external ``plotting_utilities`` repo for
paper styling (cdc_plt.py:19-22); the equivalent rcParams are inlined here.

Usage:
    python benchmarking/paper_figures.py -param params_pendulum -i 42 \
        [--mc-dir experiments/reachability/params_pendulum_mc] [--out fig.png]
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
from scipy.spatial import ConvexHull  # noqa: E402


def cm2inches(cm: float) -> float:
    return cm / 2.54


def set_paper_style(fontsize: int = 14):
    """Serif paper styling (stand-in for plotting_utilities
    ``set_figure_params``, ref: extra/cdc_plt.py:103)."""
    plt.rcParams.update({
        "font.family": "serif",
        "font.size": fontsize,
        "axes.labelsize": fontsize,
        "legend.fontsize": fontsize - 4,
        "xtick.labelsize": fontsize - 2,
        "ytick.labelsize": fontsize - 2,
    })


def _hull_vertices(pts: np.ndarray) -> np.ndarray:
    """Closed hull polygon of (n, 2) points; degenerate sets pass through."""
    if pts.shape[0] < 3:
        return pts
    try:
        h = ConvexHull(pts)
    except Exception:
        return pts
    v = np.hstack([h.vertices, h.vertices[0]])
    return h.points[v]


def fill_true_uncertainty(ax, mc_dir: str, dims=(0, 1), color="powderblue",
                          label="True uncertainty"):
    """Shade the union of consecutive-stage sample hulls from the MC chunks
    (ref: cdc_plt.py:156-207)."""
    files = sorted(glob.glob(os.path.join(mc_dir, "X_traj_list_*.pkl")))
    if not files:
        return False
    stage_pts = None
    for fn in files:
        with open(fn, "rb") as f:
            X = pickle.load(f)                     # (reps, T+1, ns, nx)
        X = np.asarray(X)
        reps, T1 = X.shape[0], X.shape[1]
        pts = X[..., list(dims)].reshape(reps, T1, -1, 2)
        if stage_pts is None:
            stage_pts = [np.empty((0, 2)) for _ in range(T1)]
        for t in range(T1):
            p = pts[:, t].reshape(-1, 2)
            p = p[np.all(np.isfinite(p), axis=1)]
            if p.shape[0] >= 3:
                hv = _hull_vertices(p)
                stage_pts[t] = np.vstack([stage_pts[t], hv])
    for t in range(len(stage_pts) - 1):
        both = np.vstack([stage_pts[t], stage_pts[t + 1]])
        if both.shape[0] < 3:
            continue
        poly = _hull_vertices(both)
        ax.fill(poly[:, 0], poly[:, 1], color=color, lw=0, alpha=1.0,
                label=label if t == 0 else None)
    return True


def plot_prediction_hulls(ax, artifact: dict, nx: int, dims=(0, 1),
                          mpc_step: int = 0, color="tab:blue",
                          label="Sampling MPC prediction"):
    """Per-stage hull outlines of the planned sample fan
    (ref: cdc_plt.py:209-226)."""
    st = np.asarray(artifact["state_traj"][mpc_step])   # (H+1, nx*ns)
    H1 = st.shape[0]
    fan = st.reshape(H1, -1, nx)[..., list(dims)]
    for t in range(1, H1):
        pts = fan[t]
        poly = _hull_vertices(pts)
        ax.plot(poly[:, 0], poly[:, 1], color=color, lw=0.8, alpha=0.8,
                label=label if t == 1 else None)


def plot_closed_loop(ax, artifact: dict, dims=(0, 1), color="black"):
    ph = np.asarray(artifact["physical_state_traj"])
    # physical_state_traj rows are tiled over ns; take the first block
    nx_total = ph.shape[1]
    traj = ph[:, list(dims)] if ph.ndim == 2 else ph
    ax.plot(traj[:, 0], traj[:, 1], "-", color=color, lw=1.5,
            label="Closed loop")
    return nx_total


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-param", default="params_pendulum")
    ap.add_argument("-env", type=int, default=0)
    ap.add_argument("-i", type=int, default=42)
    ap.add_argument("--mc-dir", default=None,
                    help="dir of X_traj_list_*.pkl MC chunks (optional)")
    ap.add_argument("--dims", type=int, nargs=2, default=(0, 1))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import yaml
    with open(os.path.join(here, "params", args.param + ".yaml")) as f:
        params = yaml.safe_load(f)
    folder = params["experiment"]["folder"]
    run_dir = os.path.join(here, "experiments", folder,
                           f"env_{args.env}", args.param, str(args.i))
    with open(os.path.join(run_dir, "data.pkl"), "rb") as f:
        artifact = pickle.load(f)
    nx = len(params["optimizer"]["x_min"])

    set_paper_style()
    fig = plt.figure(figsize=(cm2inches(12.0), cm2inches(8.0)))
    ax = fig.gca()
    if args.mc_dir:
        fill_true_uncertainty(ax, args.mc_dir, dims=tuple(args.dims))
    plot_prediction_hulls(ax, artifact, nx, dims=tuple(args.dims))
    plot_closed_loop(ax, artifact, dims=tuple(args.dims))
    ax.set_xlabel(r"$\theta$")
    ax.set_ylabel(r"$\omega$")
    ax.legend(loc="best")
    fig.tight_layout(pad=0.2)
    out = args.out or os.path.join(run_dir, "paper_phase_plane.png")
    fig.savefig(out, dpi=200)
    print(f"figure: {out}")


if __name__ == "__main__":
    main()
