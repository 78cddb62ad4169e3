"""Per-SQP-iterate debug recording (VERDICT #6).

The recorded solve (`sqp.solve_recorded`) must execute the SAME update
math as the production `sqp.solve` while capturing every iterate, its GP
function-samples, and the posterior moments of the conditioned models —
the data behind the reference's in-solve debug plots
(ref: src/solver.py:153-154, 194-352)."""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import pytest

from sampling_gpmpc_tpu import agent as agent_mod
from sampling_gpmpc_tpu.config import load_problem
from sampling_gpmpc_tpu.dempc import DEMPC
from sampling_gpmpc_tpu.envs import make_env
from sampling_gpmpc_tpu.gp.exact import GPHyperArrays
from sampling_gpmpc_tpu.ocp import sqp
from sampling_gpmpc_tpu.ocp.spec import make_ocp_data

import jax


@pytest.fixture(scope="module")
def problem():
    pdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "params")
    params, spec, data = load_problem(
        os.path.join(pdir, "params_pendulum1D_samples.yaml"))
    spec = dataclasses.replace(spec, ns=6, num_mpc_iter=2)
    params["agent"]["num_dyn_samples"] = spec.ns
    env = make_env(spec, params)
    return params, spec, data, env


def _setup(spec, data, env):
    dtype = jnp.float64
    ocp = make_ocp_data(spec, data, dtype)
    hyp = GPHyperArrays.from_spec(spec.gp, dtype)
    gp = agent_mod.init_gp_state(spec, env, dtype)
    X, U = sqp.init_iterate(spec, dtype, data.start)
    eps = agent_mod.make_epistemic(
        jax.random.PRNGKey(spec.seed), spec, dtype)[0]
    st = jnp.asarray(data.start, dtype)
    return ocp, hyp, gp, X, U, eps, st


def test_recorded_matches_while_loop(problem):
    """Same inputs => the recorded solve lands on the production solve's
    iterate (identical math, host- vs device-stepped)."""
    params, spec, data, env = problem
    ocp, hyp, gp, X, U, eps, st = _setup(spec, data, env)
    st_prod = sqp.solve(spec, env, hyp, ocp, st, X, U, gp, eps)
    st_rec, records = sqp.solve_recorded(
        spec, env, hyp, ocp, st, X, U, gp, eps)
    assert int(st_rec.it) == int(st_prod.it)
    np.testing.assert_allclose(np.asarray(st_rec.X),
                               np.asarray(st_prod.X), rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(st_rec.U),
                               np.asarray(st_prod.U), rtol=0, atol=1e-10)
    assert len(records) == int(st_rec.it)


def test_record_contents(problem):
    params, spec, data, env = problem
    ocp, hyp, gp, X, U, eps, st = _setup(spec, data, env)
    _, records = sqp.solve_recorded(spec, env, hyp, ocp, st, X, U, gp, eps)
    r = records[0]
    H, ns, g_ny, Ty = spec.H, spec.ns, spec.g_ny, spec.Ty
    assert r["X"].shape == (H + 1, ns, spec.nx)
    assert r["U"].shape == (H, spec.nu)
    assert r["dg"].shape == (ns, g_ny, H, Ty)
    assert r["mean"].shape == (ns, g_ny, H)
    assert r["std"].shape == (ns, g_ny, H)
    assert np.all(np.asarray(r["std"]) >= 0)
    assert np.isfinite(r["x_diff"]) and np.isfinite(r["u_diff"])
    # the sampled VALUES stay within the beta-clipped band around the
    # posterior mean they were drawn from (agent clipping invariant)
    beta = spec.gp.beta
    dev = np.abs(np.asarray(r["dg"])[..., 0] - np.asarray(r["mean"]))
    assert np.all(dev <= beta * np.asarray(r["std"]) + 1e-9)


def test_dempc_debug_frames(problem, tmp_path):
    """End-to-end: DEMPC with debug_sqp_dir writes one frame per SQP
    iterate and a renderable frame list; the video assembles."""
    params, spec, data, env = problem
    mpc = DEMPC(params, spec, data, env, debug_sqp_dir=str(tmp_path))
    mpc.run()
    assert len(mpc.sqp_records) >= spec.num_mpc_iter  # >=1 iterate/step
    for rec in mpc.sqp_records:
        assert os.path.exists(rec["frame"])
    from sampling_gpmpc_tpu import visu
    vid = visu.render_frames_video(
        [r["frame"] for r in mpc.sqp_records],
        os.path.join(str(tmp_path), "video_sqp.gif"))
    assert vid is not None and os.path.getsize(vid) > 0
