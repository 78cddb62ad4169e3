"""Forward-sampling reachability tests: iterative-conditioning consistency,
determinism, tube containment, rejection semantics."""

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
from sampling_gpmpc_tpu.reachability import (forward_sample_rollout,
                                             reject_and_resample)


@pytest.fixture(scope="module")
def small_problem():
    pdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "params")
    params, spec, data = load_problem(
        os.path.join(pdir, "params_pendulum1D_samples.yaml"))
    spec = dataclasses.replace(spec, ns=8)
    params["agent"]["num_dyn_samples"] = 8
    env = make_env(spec, params)
    dtype = jnp.float64
    hyp = GPHyperArrays.from_spec(spec.gp, dtype)
    return params, spec, data, env, hyp, dtype


def test_rollout_deterministic_and_consistent(small_problem):
    params, spec, data, env, hyp, dtype = small_problem
    T = 6
    gp = agent_mod.init_gp_state(spec, env, dtype, capacity=T)
    U = jnp.zeros((T, spec.nu), dtype) + 0.5
    x0 = jnp.asarray(data.start, dtype)
    key = jax.random.PRNGKey(7)

    X1, gp1 = forward_sample_rollout(spec, env, hyp, gp, x0, U, key)
    X2, _ = forward_sample_rollout(spec, env, hyp, gp, x0, U, key)
    np.testing.assert_allclose(np.asarray(X1), np.asarray(X2), atol=0)

    assert X1.shape == (T + 1, spec.ns, spec.nx)
    assert int(gp1.hall_n) == T
    # realizations diverge (different epistemic draws per sample)
    assert np.ptp(np.asarray(X1[-1]), axis=0).max() > 1e-6
    # every appended observation is value-only (gradients NaN-masked)
    assert np.all(np.isnan(np.asarray(gp1.hall_Y[:, :, :T, 1:])))
    assert not np.any(np.isnan(np.asarray(gp1.hall_Y[:, :, :T, 0])))


def test_iterative_conditioning_pins_the_function(small_problem):
    """After appending a sampled value, the posterior mean at that exact
    input must reproduce it (up to the tiny observation noise) — the
    function-realization semantics of iterative conditioning."""
    params, spec, data, env, hyp, dtype = small_problem
    T = 4
    gp = agent_mod.init_gp_state(spec, env, dtype, capacity=T)
    U = jnp.zeros((T, spec.nu), dtype) + 1.0
    x0 = jnp.asarray(data.start, dtype)
    X, gp1 = forward_sample_rollout(spec, env, hyp, gp, x0, U,
                                    jax.random.PRNGKey(3))

    Z, Y = agent_mod.full_train_set(spec, gp1)
    fact, mean, cov = agent_mod._batched_posterior(
        spec, hyp, Z, Y, gp1.hall_Z[:, 0, :T, :])
    mean = np.asarray(mean).reshape(spec.ns, spec.g_ny, T, spec.Ty)
    stored = np.asarray(gp1.hall_Y[:, :, :T, 0])
    np.testing.assert_allclose(mean[..., 0], stored, atol=5e-3)
    var = np.asarray(jax.vmap(jax.vmap(jnp.diagonal))(cov)).reshape(
        spec.ns, spec.g_ny, T, spec.Ty)
    assert var[..., 0].max() < 1e-4   # conditioned points are pinned


def test_reject_and_resample(small_problem):
    params, spec, data, env, hyp, dtype = small_problem
    gp = agent_mod.init_gp_state(spec, env, dtype)
    # mark the hall buffers per-sample so donor replacement is observable
    gp = gp._replace(hall_Z=gp.hall_Z.at[:, :, :, 0].set(
        jnp.arange(spec.ns, dtype=dtype)[:, None, None]))

    H = spec.H
    U_plan = jnp.zeros((H, spec.nu), dtype)
    x_next = jnp.asarray(data.start, dtype)
    # plan that is wildly wrong for every sample: everything gets rejected,
    # then resampled from... nobody: all-rejected keeps the data intact
    X_far = jnp.full((H + 1, spec.ns, spec.nx), 50.0, dtype)
    gp2, n_alive = reject_and_resample(
        spec, env, hyp, gp, X_far, U_plan, x_next,
        jnp.full((H,), 1e-3, dtype), jax.random.PRNGKey(0), var_eps=1e-3)
    assert int(n_alive) == 0

    # plan equal to the broadcast true state with huge tubes: all alive
    X_ok = jnp.broadcast_to(x_next[None, None], (H + 1, spec.ns, spec.nx))
    gp3, n_alive = reject_and_resample(
        spec, env, hyp, gp, X_ok, U_plan, x_next,
        jnp.full((H,), 1e3, dtype), jax.random.PRNGKey(0), var_eps=1e3)
    assert int(n_alive) == spec.ns
    np.testing.assert_allclose(np.asarray(gp3.hall_Z[:, 0, 0, 0]),
                               np.arange(spec.ns), atol=0)


def test_closed_loop_with_rejection(small_problem):
    """End-to-end closed loop with dynamics_rejection: True on a real config
    (ref: src/DEMPC.py:69-70 + src/agent.py:331-443): the run completes,
    survivor counts are recorded, and the loop still makes progress."""
    import dataclasses as dc

    from sampling_gpmpc_tpu.dempc import DEMPC

    params, spec, data, env, hyp, dtype = small_problem
    spec = dc.replace(spec, dynamics_rejection=True, num_mpc_iter=4)
    params = dict(params)
    mpc = DEMPC(params, spec, data, env, dtype=dtype)
    out = mpc.run()
    assert len(out["rejection_survivors"]) == 4
    assert all(0 <= n <= spec.ns for n in out["rejection_survivors"])
    # the tube radii of this config are generous enough that the plan's
    # own realizations are not all discarded every step
    assert max(out["rejection_survivors"]) > 0
    # closed loop still moves toward the goal
    start_err = abs(float(data.start[0]) - float(data.goal[0]))
    final_err = abs(float(out["final_state"][0]) - float(data.goal[0]))
    assert final_err < start_err
