"""Fused GP-stage kernel (ops/pallas_gp.py) vs the XLA twin.

Runs the Pallas kernel in interpret mode on the CPU test mesh and compares
the empty-hall sample stage output against the reference XLA path
(predict_real + sample_with_overrides) on the bench problem shape.
Tolerances are f32-algorithm-level: the fused path uses a precomputed
``Linv`` matmul where the twin runs a triangular solve, so agreement is
O(eps * cond), not bitwise.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sampling_gpmpc_tpu import agent as agent_mod
from sampling_gpmpc_tpu.config import load_problem
from sampling_gpmpc_tpu.envs import make_env
from sampling_gpmpc_tpu.gp.exact import GPHyperArrays
from sampling_gpmpc_tpu.ops import pallas_gp


@pytest.fixture(scope="module")
def problem():
    pdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "params")
    params, spec, data = load_problem(
        os.path.join(pdir, "params_pendulum1D_samples.yaml"))
    spec = dataclasses.replace(spec, ns=8, H=12, max_sqp_iter=2,
                               num_mpc_iter=1)
    params["agent"]["num_dyn_samples"] = spec.ns
    params["optimizer"]["H"] = spec.H
    env = make_env(spec, params)
    return params, spec, env


def _setup(spec, env):
    dtype = jnp.float32
    hyp = GPHyperArrays.from_spec(spec.gp, dtype)
    gp = agent_mod.init_gp_state(spec, env, dtype, hyp=hyp)
    key = jax.random.PRNGKey(3)
    Xt = jnp.stack([
        jnp.linspace(2.2, 3.3, spec.H),
        jnp.linspace(-1.0, 1.2, spec.H)], axis=-1).astype(dtype)
    Xt = Xt[None] + 0.05 * jax.random.normal(
        key, (spec.ns, spec.H, 2), dtype)
    eps = jax.random.truncated_normal(
        jax.random.PRNGKey(7), -spec.gp.beta, spec.gp.beta,
        (spec.ns, spec.g_ny, spec.H, spec.Ty), dtype)
    return hyp, gp, Xt, eps


def test_fused_matches_xla_twin(problem, monkeypatch):
    params, spec, env = problem
    hyp, gp, Xt, eps = _setup(spec, env)

    monkeypatch.setattr(pallas_gp, "_INTERPRET", True)
    assert pallas_gp.fused_ok(spec, hyp, jnp.float32, spec.ns,
                              spec.H * spec.Ty,
                              int(gp.real_fact["mask"].shape[-1]))
    dg_fused, gp_f = agent_mod.sample_dynamics(
        spec, env, hyp, gp, Xt, eps, hall_empty=True)

    monkeypatch.setenv("SGPMPC_NO_FUSED_GP", "1")
    dg_ref, gp_r = agent_mod.sample_dynamics(
        spec, env, hyp, gp, Xt, eps, hall_empty=True)

    dg_fused = np.asarray(dg_fused)
    dg_ref = np.asarray(dg_ref)
    assert np.all(np.isfinite(dg_fused))
    scale = float(np.max(np.abs(dg_ref)) + 1e-9)
    np.testing.assert_allclose(dg_fused, dg_ref, atol=5e-3 * scale + 5e-5)
    # the hallucination append must carry identical rows
    np.testing.assert_allclose(np.asarray(gp_f.hall_Z),
                               np.asarray(gp_r.hall_Z))
    assert int(gp_f.hall_n) == int(gp_r.hall_n)


def test_fused_beta_clip_invariant(problem, monkeypatch):
    """Fused samples respect the mean +/- beta*sigma clip (twin invariant:
    sample_with_overrides clips every row)."""
    params, spec, env = problem
    hyp, gp, Xt, eps = _setup(spec, env)
    monkeypatch.setattr(pallas_gp, "_INTERPRET", True)
    dg, _ = agent_mod.sample_dynamics(spec, env, hyp, gp, Xt, eps,
                                      hall_empty=True)

    # twin's posterior moments for the same inputs
    mean, cov = agent_mod._batched_posterior_real(spec, hyp, gp, Xt)
    var = np.clip(np.asarray(jnp.diagonal(cov, axis1=-2, axis2=-1)), 0, None)
    mean = np.asarray(mean).reshape(spec.ns, spec.g_ny, spec.H, spec.Ty)
    std = np.sqrt(var).reshape(spec.ns, spec.g_ny, spec.H, spec.Ty)
    dg = np.asarray(dg)
    slack = 1e-4 * (np.abs(mean) + std + 1.0)
    assert np.all(dg <= mean + spec.gp.beta * std + slack)
    assert np.all(dg >= mean - spec.gp.beta * std - slack)


def test_fused_hall_matches_xla_twin(problem, monkeypatch):
    """Hall-block fused kernel (SQP iterations >= 1) vs the XLA twin
    (condition_update + predict_update + sample_with_overrides) on a
    PARTIALLY filled hallucination buffer — filled rows from a real
    iteration-0 append, the rest identity/NaN padding."""
    params, spec, env = problem
    hyp, gp, Xt, eps = _setup(spec, env)

    # fill H slots the way SQP iteration 0 does (XLA path for the fill)
    monkeypatch.setenv("SGPMPC_NO_FUSED_GP", "1")
    _, gp_filled = agent_mod.sample_dynamics(
        spec, env, hyp, gp, Xt, eps, hall_empty=True)
    assert int(gp_filled.hall_n) == spec.H
    assert gp_filled.hall_Z.shape[2] > spec.H   # padding slots remain

    # iteration-1 inputs: a perturbed iterate and fresh draws
    Xt1 = Xt + 0.03 * jax.random.normal(jax.random.PRNGKey(11),
                                        Xt.shape, Xt.dtype)
    eps1 = jax.random.truncated_normal(
        jax.random.PRNGKey(13), -spec.gp.beta, spec.gp.beta,
        (spec.ns, spec.g_ny, spec.H, spec.Ty), jnp.float32)

    dg_ref, gp_r = agent_mod.sample_dynamics(
        spec, env, hyp, gp_filled, Xt1, eps1, hall_empty=False)

    monkeypatch.delenv("SGPMPC_NO_FUSED_GP")
    monkeypatch.setattr(pallas_gp, "_INTERPRET", True)
    assert pallas_gp.fused_hall_ok(
        spec, hyp, jnp.float32, spec.ns, spec.H * spec.Ty,
        int(gp_filled.real_fact["mask"].shape[-1]),
        int(gp_filled.hall_Z.shape[2]) * spec.Ty)
    dg_fused, gp_f = agent_mod.sample_dynamics(
        spec, env, hyp, gp_filled, Xt1, eps1, hall_empty=False)

    dg_fused = np.asarray(dg_fused)
    dg_ref = np.asarray(dg_ref)
    assert np.all(np.isfinite(dg_fused))
    scale = float(np.max(np.abs(dg_ref)) + 1e-9)
    np.testing.assert_allclose(dg_fused, dg_ref, atol=5e-3 * scale + 5e-5)
    # identical appends on both paths
    np.testing.assert_allclose(np.asarray(gp_f.hall_Z),
                               np.asarray(gp_r.hall_Z))
    assert int(gp_f.hall_n) == int(gp_r.hall_n) == 2 * spec.H


def test_fused_gate_excludes_unsupported(problem):
    params, spec, env = problem
    hyp = GPHyperArrays.from_spec(spec.gp, jnp.float32)
    # f64 -> XLA path
    assert not pallas_gp.fused_ok(spec, hyp, jnp.float64, 8, 36, 108)
    # min-dist override is now IN-kernel (close/ynear inputs) -> fused ok
    hyp_md = dataclasses.replace(hyp, min_data_dist=0.1)
    assert pallas_gp.fused_ok(spec, hyp_md, jnp.float32, 8, 36, 108) \
        == (pallas_gp._INTERPRET
            or pallas_gp._device_platform() in ("tpu", "axon"))
    # mean-as-sample -> XLA path
    spec_m = dataclasses.replace(spec, mean_as_dyn_sample=True)
    assert not pallas_gp.fused_ok(spec_m, hyp, jnp.float32, 8, 36, 108)


def test_fused_min_dist_and_var_zero_match_xla(problem, monkeypatch):
    """The pendulum-config overrides (min_data_dist >= 0 AND the Ty>1
    zero-variance point override, ref params_pendulum.yaml:43-44) through
    the fused kernels vs the XLA twin, empty-hall AND hall-block."""
    params, spec, env = problem
    hyp, gp, Xt, eps = _setup(spec, env)
    # activate both overrides; min_data_dist large enough that several
    # test points sit within range of the 6x6 training grid
    hyp = dataclasses.replace(hyp, min_data_dist=0.15,
                              variance_is_zero=1.1e-6)
    spec = dataclasses.replace(
        spec, gp=dataclasses.replace(spec.gp, min_data_dist=0.15,
                                     variance_is_zero=1.1e-6))

    monkeypatch.setenv("SGPMPC_NO_FUSED_GP", "1")
    dg_ref, gp_r = agent_mod.sample_dynamics(
        spec, env, hyp, gp, Xt, eps, hall_empty=True)
    dg_ref1, _ = agent_mod.sample_dynamics(
        spec, env, hyp, gp_r, Xt + 0.03, eps, hall_empty=False)

    monkeypatch.delenv("SGPMPC_NO_FUSED_GP")
    monkeypatch.setattr(pallas_gp, "_INTERPRET", True)
    dg_fused, gp_f = agent_mod.sample_dynamics(
        spec, env, hyp, gp, Xt, eps, hall_empty=True)
    dg_fused1, _ = agent_mod.sample_dynamics(
        spec, env, hyp, gp_f, Xt + 0.03, eps, hall_empty=False)

    for a, b in ((dg_fused, dg_ref), (dg_fused1, dg_ref1)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(a))
        scale = float(np.max(np.abs(b)) + 1e-9)
        np.testing.assert_allclose(a, b, atol=5e-3 * scale + 5e-5)
    # the dedup filter must also have NaN-masked identically
    np.testing.assert_array_equal(np.isnan(np.asarray(gp_f.hall_Y)),
                                  np.isnan(np.asarray(gp_r.hall_Y)))
