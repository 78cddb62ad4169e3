"""Closed-loop car tests: full-GP bicycle with soft ellipse obstacles, and
the long-horizon open-loop sampling config."""

import dataclasses
import os

import numpy as np
import pytest

from sampling_gpmpc_tpu.config import load_problem
from sampling_gpmpc_tpu.dempc import DEMPC
from sampling_gpmpc_tpu.envs import make_env


def _load(name, **over):
    pdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "params")
    params, spec, data = load_problem(os.path.join(pdir, name + ".yaml"))
    if over:
        spec = dataclasses.replace(spec, **over)
    return params, spec, data


def test_car_obstacles_closed_loop():
    params, spec, data = _load("params_car", num_mpc_iter=12)
    env = make_env(spec, params)
    mpc = DEMPC(params, spec, data, env)
    out = mpc.run()
    assert out["sqp_status"] == 0

    ph = np.stack(out["physical_state_traj"])
    # accelerates toward the goal lane
    assert ph[-1, 0] > 0.3
    assert ph[-1, 3] > 0.5
    # lane bounds hold in closed loop
    assert np.all(ph[:, 1] >= data.x_min[1] - 1e-6)
    assert np.all(ph[:, 1] <= data.x_max[1] + 1e-6)
    # planned samples stay outside the (soft) obstacle ellipses with slack
    X = out["state_traj"][-1]
    for (x0, y0, a, b, f) in data.ellipses:
        q = (X[:, :, 0] - x0) ** 2 / a + (X[:, :, 1] - y0) ** 2 / b
        assert q.min() > f - 0.5, "deep obstacle penetration in the plan"


def test_car_samples_open_loop_plan():
    """H=100 open-loop plan with ns=10 sampled dynamics (params_car_samples):
    one solve, feasibility and sample-fan checks."""
    params, spec, data = _load("params_car_samples")
    env = make_env(spec, params)
    mpc = DEMPC(params, spec, data, env)
    out = mpc.run()
    assert out["sqp_status"] == 0
    X = out["state_traj"][0]
    assert X.shape == (101, 10, 4)
    # forward motion over the long horizon
    assert X[-1, :, 0].mean() > X[0, :, 0].mean() + 5.0
    # the sample fan spreads
    assert np.ptp(X[-1], axis=0).max() > 1e-3
