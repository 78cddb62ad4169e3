"""Environment golden tests: analytic Jacobians vs autodiff, decomposition
consistency, training-grid shapes."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sampling_gpmpc_tpu.config import load_problem
from sampling_gpmpc_tpu.envs import make_env

CONFIGS = ["params_pendulum1D_samples", "params_car_residual", "params_pendulum"]


@pytest.fixture(params=CONFIGS)
def problem(request, params_dir):
    params, spec, data = load_problem(
        os.path.join(params_dir, request.param + ".yaml"))
    return params, spec, data, make_env(spec, params)


def _rand_xu(spec, key):
    return jax.random.uniform(key, (spec.nx + spec.nu,), minval=0.3, maxval=1.2,
                              dtype=jnp.float64)


def test_g_prior_matches_autodiff(problem):
    """Analytic value+gradient rows of g must equal jacfwd of g_val."""
    _, spec, _, env = problem
    z = jax.random.uniform(jax.random.PRNGKey(0), (spec.g_nx + spec.g_nu,),
                           minval=0.2, maxval=0.9, dtype=jnp.float64)
    prior = env.g_prior(z)
    assert prior.shape == (spec.g_ny, 1 + spec.g_nx + spec.g_nu)
    np.testing.assert_allclose(prior[:, 0], env.g_val(z), rtol=1e-12)
    J = jax.jacfwd(env.g_val)(z)
    np.testing.assert_allclose(prior[:, 1:], J, rtol=1e-9, atol=1e-12)


def test_f_known_jacobian_matches_autodiff(problem):
    _, spec, _, env = problem
    xu = _rand_xu(spec, jax.random.PRNGKey(1))
    vj = env.f_val_jac(xu)
    assert vj.shape == (spec.nx, 1 + spec.nx + spec.nu)
    f = lambda xu_: env.f_val_jac(xu_)[:, 0]
    np.testing.assert_allclose(vj[:, 1:], jax.jacfwd(f)(xu), atol=1e-12)


def test_discrete_dyn_matches_full_jacobian_value(problem):
    """f + B_d g must equal the value column of the assembled jacobian when
    the GP 'sample' is the analytic prior (true-dynamics oracle)."""
    _, spec, _, env = problem
    xu = _rand_xu(spec, jax.random.PRNGKey(2))
    dg = env.g_prior(env.g_inputs(xu))
    combined = env.assemble_val_jac(xu, dg)
    x_next = env.discrete_dyn(xu[: spec.nx], xu[spec.nx:])
    np.testing.assert_allclose(combined[:, 0], x_next, rtol=1e-12)


def test_assembled_jacobian_matches_autodiff_of_true_dyn(problem):
    """With the analytic prior as sample, the assembled (d/dx, d/du) block
    must equal the autodiff jacobian of the true discrete dynamics."""
    _, spec, _, env = problem
    xu = _rand_xu(jax.tree_util.tree_map(lambda s: s, spec), jax.random.PRNGKey(3))

    def step(xu_):
        return env.discrete_dyn(xu_[: spec.nx], xu_[spec.nx:])

    dg = env.g_prior(env.g_inputs(xu))
    combined = env.assemble_val_jac(xu, dg)
    J = jax.jacfwd(step)(xu)
    np.testing.assert_allclose(combined[:, 1:], J, rtol=1e-9, atol=1e-11)


def test_training_grid_shapes(problem):
    _, spec, _, env = problem
    X, Y = env.training_grid()
    D = spec.g_nx + spec.g_nu
    assert X.shape[1] == D
    assert Y.shape == (spec.g_ny, X.shape[0], 1 + D)
    if not spec.train_data_has_derivatives:
        assert np.all(np.isnan(Y[:, :, 1:]))
        assert not np.any(np.isnan(Y[:, :, 0]))
