"""Sharded-solver equivalence: the ns-sharded SQP solve on an 8-device CPU
mesh must match the single-device solve bit-for-bit (same folded epistemic
draws, same QP path) — SURVEY §4 oracle (5)."""

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
from sampling_gpmpc_tpu.ocp import sqp
from sampling_gpmpc_tpu.ocp.spec import make_ocp_data
from sampling_gpmpc_tpu.parallel.mesh import sample_mesh
from sampling_gpmpc_tpu.parallel.sharded import make_sharded_solve


@pytest.fixture(scope="module")
def problem():
    pdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "params")
    params, spec, data = load_problem(
        os.path.join(pdir, "params_pendulum1D_samples.yaml"))
    # ns must divide the 8-device mesh; keep shapes small for test speed
    spec = dataclasses.replace(spec, ns=16, num_mpc_iter=1)
    params["agent"]["num_dyn_samples"] = 16
    env = make_env(spec, params)
    return params, spec, data, env


def _setup(spec, data, env):
    dtype = jnp.float64
    ocp = make_ocp_data(spec, data, dtype)
    hyp = GPHyperArrays.from_spec(spec.gp, dtype)
    gp = agent_mod.init_gp_state(spec, env, dtype)
    X, U = sqp.init_iterate(spec, dtype, data.start)
    eps = agent_mod.make_epistemic(jax.random.PRNGKey(spec.seed), spec, dtype)
    st = jnp.asarray(data.start, dtype)
    return dtype, ocp, hyp, gp, X, U, eps[0], st


def test_sharded_matches_single_device(problem):
    params, spec, data, env = problem
    assert len(jax.devices()) == 8
    dtype, ocp, hyp, gp, X, U, eps, st = _setup(spec, data, env)

    single = jax.jit(lambda st, X, U, gp, eps: sqp.solve(
        spec, env, hyp, ocp, st, X, U, gp, eps))
    ref = single(st, X, U, gp, eps)

    mesh = sample_mesh(8)
    sharded = make_sharded_solve(spec, env, hyp, ocp, mesh)
    out = sharded(st, X, U, gp, eps)

    np.testing.assert_allclose(np.asarray(out.U), np.asarray(ref.U),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(out.X), np.asarray(ref.X),
                               rtol=1e-8, atol=1e-10)
    assert int(out.status) == int(ref.status)
    assert int(out.it) == int(ref.it)


def test_sharded_two_vs_eight_devices(problem):
    """Scaling-degree invariance: 2-device and 8-device meshes agree."""
    params, spec, data, env = problem
    dtype, ocp, hyp, gp, X, U, eps, st = _setup(spec, data, env)
    out2 = make_sharded_solve(spec, env, hyp, ocp, sample_mesh(2))(
        st, X, U, gp, eps)
    out8 = make_sharded_solve(spec, env, hyp, ocp, sample_mesh(8))(
        st, X, U, gp, eps)
    # reduction order differs between shard counts: tolerance is fp-noise
    np.testing.assert_allclose(np.asarray(out2.U), np.asarray(out8.U),
                               rtol=1e-6, atol=1e-8)


def test_ordered_sharded_matches_blocked_reference(problem):
    """Determinism mode (parallel/collectives.py): the ordered-collectives
    sharded solve must match the single-device blocked (vmap) simulation
    over MULTIPLE SQP iterations at a tight tolerance — the
    same-reduction-order comparison that plain psum cannot support (its
    device-order ulp noise is chaotically amplified per iteration)."""
    import dataclasses as dc

    from sampling_gpmpc_tpu.parallel.sharded import make_blocked_solve

    params, spec, data, env = problem
    spec3 = dc.replace(spec, max_sqp_iter=3, tol_nlp=0.0)
    dtype, ocp, hyp, gp, X, U, eps, st = _setup(spec3, data, env)

    out = make_sharded_solve(spec3, env, hyp, ocp, sample_mesh(8),
                             ordered=True)(st, X, U, gp, eps)
    ref = make_blocked_solve(spec3, env, hyp, ocp, 8)(st, X, U, gp, eps)
    assert int(out.it) == 3 and int(ref.it) == 3
    np.testing.assert_allclose(np.asarray(out.U), np.asarray(ref.U),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.X), np.asarray(ref.X),
                               atol=1e-6)
    hall = np.abs(np.asarray(out.gp.hall_Y) - np.asarray(ref.gp.hall_Y))
    assert np.nanmax(hall) < 1e-6


def test_sharded_rollout(problem):
    """ns-sharded forward-sampling reachability: correct shapes, finite,
    realizations diverge, deterministic per key."""
    import jax.numpy as jnp
    from sampling_gpmpc_tpu.parallel.sharded import make_sharded_rollout

    params, spec, data, env = problem
    dtype = jnp.float64
    hyp = GPHyperArrays.from_spec(spec.gp, dtype)
    T = 5
    gp = agent_mod.init_gp_state(spec, env, dtype, capacity=T)
    U = jnp.zeros((T, spec.nu), dtype) + 0.5
    x0 = jnp.asarray(data.start, dtype)
    mesh = sample_mesh(8)
    roll = make_sharded_rollout(spec, env, hyp, mesh)
    X1, gp1 = roll(gp, x0, U, jax.random.PRNGKey(5))
    X2, _ = roll(gp, x0, U, jax.random.PRNGKey(5))
    X1 = np.asarray(X1)
    assert X1.shape == (T + 1, spec.ns, spec.nx)
    assert np.all(np.isfinite(X1))
    np.testing.assert_array_equal(X1, np.asarray(X2))
    assert np.ptp(X1[-1], axis=0).max() > 1e-6
    assert int(gp1.hall_n) == T
