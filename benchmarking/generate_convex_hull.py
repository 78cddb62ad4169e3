"""Per-stage convex hulls over sampled trajectories (B4 equivalent).

Aggregates the pickles written by simulate_forward_sampling.py into one
convex hull per stage over the (x, y) positions of all realizations
(ref: benchmarking/generate_convex_hull.py:76-104).

Usage:
    python benchmarking/generate_convex_hull.py --dir experiments/reachability/params_car_residual_fs
"""

import argparse
import glob
import os
import pickle
import sys

import numpy as np
from scipy.spatial import ConvexHull

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage_hulls(trajs: np.ndarray, dims=(0, 1)):
    """Per-stage hull vertices.

    Non-finite realizations (f32 rollouts can lose ~1 in 4000 marginally
    stable samples to divergence, BENCH_NOTES "f32 status") are dropped
    from EVERY stage with a visible count — a NaN row would otherwise
    poison the QHull call silently.

    Args:
        trajs: (n_total, T+1, nx) stacked realizations.
    Returns:
        list of (n_vertices, 2) arrays, one per stage.
    """
    alive = np.isfinite(trajs).all(axis=(1, 2))
    if not alive.all():
        print(f"# dropping {int((~alive).sum())}/{len(alive)} non-finite "
              "realizations from the hulls")
        trajs = trajs[alive]
    hulls = []
    for k in range(trajs.shape[1]):
        pts = trajs[:, k][:, list(dims)]
        if np.ptp(pts, axis=0).min() < 1e-12:
            hulls.append(pts[:1])
            continue
        hull = ConvexHull(pts)
        hulls.append(pts[hull.vertices])
    return hulls


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dir", required=True)
    parser.add_argument("--dims", type=int, nargs=2, default=[0, 1])
    args = parser.parse_args()

    files = sorted(glob.glob(os.path.join(args.dir, "data_X_traj_*.pkl")))
    if not files:
        raise SystemExit(f"no rollout pickles under {args.dir}")
    blocks = []
    for fn in files:
        with open(fn, "rb") as f:
            d = pickle.load(f)
        blocks.append(np.transpose(d["X_traj"], (1, 0, 2)))  # (ns, T+1, nx)
    trajs = np.concatenate(blocks, axis=0)
    hulls = stage_hulls(trajs, dims=tuple(args.dims))

    out = os.path.join(args.dir, "convex_hulls.pkl")
    with open(out, "wb") as f:
        pickle.dump({"hulls": hulls, "n_total": trajs.shape[0]}, f)
    areas = []
    for h in hulls:
        areas.append(0.0 if len(h) < 3 else ConvexHull(h).volume)
    print(f"{trajs.shape[0]} realizations, {len(hulls)} stages -> {out}")
    print("stage hull areas:", np.round(areas, 4))


if __name__ == "__main__":
    main()
