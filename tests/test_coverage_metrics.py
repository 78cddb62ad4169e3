"""Reachable-set coverage metrics (E9, ref extra/reachable_set_coverage.py).

Oracles: exact geometry on synthetic point sets — a prediction that
contains the truth scores coverage 1 and volume ratio > 1; a shifted
prediction of identical volume scores ratio ~1 but low coverage (the case
the volume metric alone misses)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarking"))

import reachable_set_coverage as rc  # noqa: E402


def _disc(rng, n, center, r):
    th = rng.uniform(0, 2 * np.pi, n)
    rad = r * np.sqrt(rng.uniform(0, 1, n))
    return np.stack([center[0] + rad * np.cos(th),
                     center[1] + rad * np.sin(th)], axis=1)


def test_containing_prediction_scores_full_coverage():
    rng = np.random.default_rng(0)
    truth = _disc(rng, 400, (0, 0), 1.0)
    pred = _disc(rng, 400, (0, 0), 1.5)
    assert rc.coverage_fraction(pred, truth) == 1.0
    assert rc.hull_volume(pred) > rc.hull_volume(truth)


def test_shifted_prediction_volume_lies_coverage_does_not():
    rng = np.random.default_rng(1)
    truth = _disc(rng, 400, (0, 0), 1.0)
    pred = _disc(rng, 400, (2.5, 0), 1.0)       # same size, wrong place
    ratio = rc.hull_volume(pred) / rc.hull_volume(truth)
    assert 0.8 < ratio < 1.25                    # volume metric fooled
    assert rc.coverage_fraction(pred, truth) < 0.05


def test_degenerate_inputs_fall_back_to_intervals():
    line = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]])
    assert rc.hull_volume(line) == 0.0
    # collinear prediction: bounding-interval fallback, self-coverage 1
    assert rc.coverage_fraction(line, line) == 1.0
    outside = np.array([[3.0, 3.0], [0.5, 0.5]])
    assert rc.coverage_fraction(line, outside) == 0.5
    # degenerate truth: vol_ratio reported as None, coverage still scored
    rows = rc.coverage_table(np.tile(line[None], (2, 1, 1)),
                             np.tile(line[None], (2, 1, 1)), dims=(0, 1))
    assert rows[0]["vol_ratio"] is None
    assert rows[0]["coverage"] == 1.0


def test_coverage_table_stages():
    rng = np.random.default_rng(2)
    T, npred, ntrue, nx = 5, 200, 300, 3
    # truth grows per stage; prediction is truth inflated by 1.3
    true = np.stack([_pad3(_disc(rng, ntrue, (k * 0.1, 0), 0.2 + 0.1 * k))
                     for k in range(T)])
    pred = np.stack([_pad3(_disc(rng, npred, (k * 0.1, 0),
                                 1.3 * (0.2 + 0.1 * k)))
                     for k in range(T)])
    rows = rc.coverage_table(pred, true, dims=(0, 1))
    assert [r["stage"] for r in rows] == list(range(1, T))
    assert all(r["coverage"] > 0.97 for r in rows)
    assert all(r["vol_ratio"] > 1.2 for r in rows)


def _pad3(pts2):
    return np.concatenate([pts2, np.zeros((pts2.shape[0], 1))], axis=1)
