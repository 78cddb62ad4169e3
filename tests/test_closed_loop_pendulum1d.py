"""Closed-loop pendulum1D with full GP sampling (ns=70): the M3 milestone.

Oracle: the controller must swing the pendulum from theta=2.15 toward the
upright goal pi while respecting the tightened state bounds — the
qualitative profile of the reference experiment (SURVEY §2.1 workload
table), plus GP-internal invariants."""

import dataclasses
import os

import numpy as np
import pytest

from sampling_gpmpc_tpu.config import load_problem
from sampling_gpmpc_tpu.dempc import DEMPC
from sampling_gpmpc_tpu.envs import make_env


@pytest.fixture(scope="module")
def out_and_problem():
    pdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "params")
    params, spec, data = load_problem(
        os.path.join(pdir, "params_pendulum1D_samples.yaml"))
    spec = dataclasses.replace(spec, num_mpc_iter=15)
    env = make_env(spec, params)
    mpc = DEMPC(params, spec, data, env)
    out = mpc.run()
    return out, spec, data, mpc


def test_swingup_progress(out_and_problem):
    out, spec, data, _ = out_and_problem
    assert out["sqp_status"] == 0
    ph = np.stack(out["physical_state_traj"])
    # monotone progress toward the upright position over 15 steps
    assert ph[-1, 0] > ph[0, 0] + 0.25
    assert ph[-1, 0] < np.pi + 0.1


def test_bounds_hold(out_and_problem):
    out, spec, data, _ = out_and_problem
    ph = np.stack(out["physical_state_traj"])
    assert np.all(ph[:, 0] >= data.x_min[0] - 1e-8)
    assert np.all(ph[:, 0] <= data.x_max[0] + 1e-8)
    assert np.all(np.abs(ph[:, 1]) <= data.x_max[1] + 1e-8)


def test_sampled_plans_spread_and_shared_input(out_and_problem):
    """The ns sampled trajectories share the input but differ in state —
    the augmented-state structure (ref: src/utils/model.py:10-41)."""
    out, spec, _, _ = out_and_problem
    X = out["state_traj"][-1]           # (H+1, ns, nx)
    assert X.shape[1] == spec.ns
    # all samples start at the same pinned x0
    assert np.ptp(X[0], axis=0).max() < 1e-8
    # downstream stages diverge across samples (epistemic spread)
    assert np.ptp(X[-1], axis=0).max() > 1e-5


def test_hallucination_buffer_filled(out_and_problem):
    out, spec, _, mpc = out_and_problem
    gp = mpc.gp_state
    n = int(gp.hall_n)
    assert 0 < n <= gp.hall_Y.shape[2]
    filled = np.asarray(gp.hall_Y[:, :, :n, 0])
    assert not np.any(np.isnan(filled))
    # value entries beyond the fill pointer stay masked
    assert np.all(np.isnan(np.asarray(gp.hall_Y[:, :, n:, 0])))
