"""Recorder artifact roundtrip + visualization smoke tests."""

import dataclasses
import os

import numpy as np
import pytest

from sampling_gpmpc_tpu.config import load_problem
from sampling_gpmpc_tpu.dempc import DEMPC
from sampling_gpmpc_tpu.envs import make_env
from sampling_gpmpc_tpu.recorder import Recorder


@pytest.fixture(scope="module")
def short_run(tmp_path_factory, params_dir):
    params, spec, data = load_problem(
        os.path.join(params_dir, "params_pendulum1D_samples.yaml"))
    spec = dataclasses.replace(spec, ns=8, num_mpc_iter=3)
    params["agent"]["num_dyn_samples"] = 8
    env = make_env(spec, params)
    out_dir = str(tmp_path_factory.mktemp("run"))
    rec = Recorder(params, out_dir)
    rec.tilde_eps_list = data.tilde_eps
    rec.ci_list = data.ci
    mpc = DEMPC(params, spec, data, env, recorder=rec)
    mpc.run()
    return params, spec, data, rec, out_dir


def test_artifact_roundtrip(short_run):
    params, spec, data, rec, out_dir = short_run
    path = rec.save_data()
    loaded = Recorder.load(path)
    # the reference artifact contract (ref: src/visu.py:497-517)
    for key in ["state_traj", "input_traj", "physical_state_traj",
                "true_state_traj", "mean_state_traj", "solver_time",
                "tilde_eps_list", "ci_list", "gp_model_after_solve_train_X",
                "gp_model_after_solve_train_Y"]:
        assert key in loaded, key
    assert len(loaded["state_traj"]) == 3
    assert len(loaded["mean_state_traj"]) == 3
    X0 = loaded["state_traj"][0]
    assert X0.shape == (spec.H + 1, spec.ns * spec.nx)
    # recorded re-propagations start at the plan's x0 and span H+1 stages
    for key in ["true_state_traj", "mean_state_traj"]:
        traj = loaded[key][0]
        assert traj.shape == (spec.H + 1, spec.nx)
        np.testing.assert_allclose(traj[0], X0[0, :spec.nx], atol=1e-9)
        assert np.all(np.isfinite(traj))


def test_render_run(short_run):
    from sampling_gpmpc_tpu.visu import render_run
    params, spec, data, rec, out_dir = short_run
    rec.save_data()
    loaded = Recorder.load(os.path.join(out_dir, "data.pkl"))
    png = render_run(loaded, params, out_dir, tilde_eps=data.tilde_eps,
                     P=data.P_term)
    assert os.path.exists(png)


def test_plot_sqp_iterate(short_run, tmp_path):
    from sampling_gpmpc_tpu.visu import plot_sqp_iterate
    params, spec, data, rec, out_dir = short_run
    X = np.asarray(rec.state_traj[-1]).reshape(spec.H + 1, spec.ns, spec.nx)
    U = np.asarray(rec.input_traj[-1])
    p = plot_sqp_iterate(str(tmp_path / "iterate.png"), X, U,
                         x_bounds=[data.x_min[1], data.x_max[1]])
    assert os.path.exists(p)


def test_live_renderer(short_run, tmp_path):
    """In-loop frame grabbing (ref: src/DEMPC.py:60-66): a frame per grab,
    file finalized on close, same plan/path content as the loop produces."""
    from sampling_gpmpc_tpu.visu import LiveRenderer
    params, spec, data, rec, out_dir = short_run
    live = LiveRenderer(params, str(tmp_path), fps=2,
                        tilde_eps=data.tilde_eps, P=data.P_term)
    X0 = rec.state_traj[0].reshape(spec.H + 1, spec.ns, spec.nx)
    for m, x in enumerate(rec.physical_state_traj[:2]):
        live.grab(np.asarray(x).reshape(-1)[:spec.nx], X0)
    path = live.close()
    assert live.frames == 2
    assert os.path.exists(path) and os.path.getsize(path) > 0
