"""Paper-figure script (E9) unit coverage: hull helpers + full render from
a synthetic artifact + MC chunks (ref pipeline: extra/cdc_plt.py)."""

import os
import pickle
import sys

import matplotlib
import numpy as np

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarking"))

import paper_figures as pf  # noqa: E402


def test_hull_vertices_degenerate_and_regular():
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5]], float)
    poly = pf._hull_vertices(sq)
    assert poly.shape[0] == 5          # 4 vertices + closure
    assert not np.any(np.all(poly == [0.5, 0.5], axis=1))
    line = np.array([[0.0, 0.0], [1.0, 1.0]])
    assert pf._hull_vertices(line).shape == (2, 2)


def test_full_render(tmp_path):
    rng = np.random.default_rng(0)
    nx, ns, H1, T1, reps = 2, 6, 5, 5, 3
    fan = rng.normal(size=(H1, ns, nx)).cumsum(axis=0)
    artifact = {
        "state_traj": [fan.reshape(H1, -1)],
        "physical_state_traj": rng.normal(size=(4, nx)),
    }
    mc = rng.normal(size=(reps, T1, ns, nx)).cumsum(axis=1)
    mc_dir = tmp_path / "mc"
    mc_dir.mkdir()
    with open(mc_dir / "X_traj_list_0.pkl", "wb") as f:
        pickle.dump(mc, f)

    fig = plt.figure()
    ax = fig.gca()
    assert pf.fill_true_uncertainty(ax, str(mc_dir))
    pf.plot_prediction_hulls(ax, artifact, nx)
    pf.plot_closed_loop(ax, artifact)
    out = tmp_path / "fig.png"
    fig.savefig(out)
    plt.close(fig)
    assert out.stat().st_size > 0
    # empty MC dir is reported, not fatal
    assert not pf.fill_true_uncertainty(ax, str(tmp_path / "nope"))
