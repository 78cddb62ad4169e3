"""A failed QP's step must never be consumed (ref: solver.py:146-151).

The reference breaks the SQP loop on a nonzero acados status BEFORE
fetching the failed solve's iterate; the closed loop then proceeds from
the last good plan.  Consuming a garbage step was measured to drive f32
car plans through obstacle ellipses (plan min ellipse value 0.3 vs the
feasible 1.0).  These tests force a failure and pin the revert semantics
in both solve paths (jitted while_loop + host-loop debug twin).
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
from sampling_gpmpc_tpu.ocp import sqp
from sampling_gpmpc_tpu.ocp.spec import make_ocp_data


@pytest.fixture()
def tiny_problem(params_dir):
    params, spec, data = load_problem(
        os.path.join(params_dir, "params_pendulum1D_samples.yaml"))
    spec = dataclasses.replace(spec, ns=4, H=6, max_sqp_iter=3)
    params["agent"]["num_dyn_samples"] = spec.ns
    params["optimizer"]["H"] = spec.H
    from sampling_gpmpc_tpu.config import make_data
    data = make_data(params, spec)
    env = make_env(spec, params)
    dtype = jnp.float64
    ocp = make_ocp_data(spec, data, dtype)
    hyp = GPHyperArrays.from_spec(spec.gp, dtype)
    gp = agent_mod.init_gp_state(spec, env, dtype)
    X, U = sqp.init_iterate(spec, dtype, data.start)
    eps = agent_mod.make_epistemic(jax.random.PRNGKey(0), spec, dtype)[0]
    x0 = jnp.asarray(data.start, dtype)
    return spec, env, hyp, ocp, x0, X, U, gp, eps


def _force_fail(monkeypatch, fail_from_iter: int):
    """Patch sqp's solve_qp_soft to report failure from a given SQP iter.

    The call count is traced once per loop body; instead gate on a traced
    flag: we flip status to 4 whenever the incoming warm-start validity
    says at least `fail_from_iter` QPs already ran — iteration 0 enters
    with qp_valid=False, later ones with True.
    """
    real = sqp.solve_qp_soft

    def fail_all(*a, **kw):
        sol = real(*a, **kw)
        return sol._replace(status=jnp.asarray(4))

    def fail_warm_only(*a, **kw):
        sol = real(*a, **kw)
        ws_valid = kw.get("ws_valid")
        bad = jnp.asarray(4)
        status = jnp.where(ws_valid, bad, sol.status)
        return sol._replace(status=status)

    monkeypatch.setattr(sqp, "solve_qp_soft",
                        fail_all if fail_from_iter == 0 else fail_warm_only)


def test_failed_first_qp_keeps_warm_start_iterate(tiny_problem,
                                                  monkeypatch):
    spec, env, hyp, ocp, x0, X, U, gp, eps = tiny_problem
    _force_fail(monkeypatch, fail_from_iter=0)
    st = jax.jit(lambda *a: sqp.solve(spec, env, hyp, ocp, *a))(
        x0, X, U, gp, eps)
    assert int(st.status) == 4
    assert int(st.it) == 1                       # loop broke immediately
    np.testing.assert_array_equal(np.asarray(st.X), np.asarray(X))
    np.testing.assert_array_equal(np.asarray(st.U), np.asarray(U))
    assert not bool(st.qp_valid)                 # garbage ws dropped


def test_failed_later_qp_keeps_last_good_iterate(tiny_problem, monkeypatch):
    spec, env, hyp, ocp, x0, X, U, gp, eps = tiny_problem
    # reference run (no failures) for the iterate after iteration 0
    st1 = jax.jit(lambda *a: sqp.solve(
        dataclasses.replace(spec, max_sqp_iter=1), env, hyp, ocp, *a))(
        x0, X, U, gp, eps)
    assert int(st1.status) == 0

    _force_fail(monkeypatch, fail_from_iter=1)
    st = jax.jit(lambda *a: sqp.solve(spec, env, hyp, ocp, *a))(
        x0, X, U, gp, eps)
    assert int(st.status) == 4
    assert int(st.it) == 2                       # iter 0 ok, iter 1 failed
    np.testing.assert_allclose(np.asarray(st.X), np.asarray(st1.X),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(st.U), np.asarray(st1.U),
                               rtol=0, atol=0)


def test_host_twin_reverts_identically(tiny_problem, monkeypatch):
    spec, env, hyp, ocp, x0, X, U, gp, eps = tiny_problem
    _force_fail(monkeypatch, fail_from_iter=0)
    st, recs = sqp.solve_recorded(spec, env, hyp, ocp, x0, X, U, gp, eps)
    assert int(st.status) == 4
    np.testing.assert_array_equal(np.asarray(st.X), np.asarray(X))
    np.testing.assert_array_equal(np.asarray(st.U), np.asarray(U))
