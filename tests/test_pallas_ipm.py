"""Fused Pallas IPM vs the XLA while_loop twin (interpreter mode).

The fused kernel must reproduce the XLA path's converged solutions on the
same (f32) problems — same algorithm, same equilibrated data, different
execution engine.  Interpreter mode runs the kernel off-TPU so CI covers
the kernel logic; the TPU timing claim lives in BENCH_NOTES.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from sampling_gpmpc_tpu.ocp.qp import solve_qp_soft
from sampling_gpmpc_tpu.ops import pallas_ipm


@pytest.fixture
def interp(monkeypatch):
    monkeypatch.setattr(pallas_ipm, "_INTERPRET", True)


def _rand_soft(seed, nU=6, mh=10, ms=5, tight=True):
    rng = np.random.default_rng(seed)
    Hh = rng.normal(size=(nU, nU))
    H = Hh @ Hh.T + np.eye(nU)
    g = rng.normal(size=nU) * 3
    G_h = rng.normal(size=(mh, nU))
    d_h = rng.uniform(0.1, 1.5, size=mh)
    G_s = rng.normal(size=(ms, nU))
    lo = rng.uniform(-0.5, -0.1, size=ms)
    hi = rng.uniform(0.05, 0.3 if tight else 2.0, size=ms)
    zl, zu = np.full(ms, 3.0), np.full(ms, 2.0)
    Zl, Zu = np.full(ms, 5.0), np.full(ms, 4.0)
    return [jnp.asarray(a, jnp.float32)
            for a in (H, g, G_h, d_h, G_s, lo, hi, zl, zu, Zl, Zu)]


def _xla_solve(args, monkeypatch, **kw):
    with monkeypatch.context() as m:
        m.setenv("SGPMPC_NO_FUSED_IPM", "1")
        return solve_qp_soft(*args, **kw)


@pytest.mark.parametrize("max_iter", [5, 20, 23])
def test_fused_respects_max_iter_exactly(interp, max_iter):
    """The chunked outer loop must not overshoot the global iteration cap
    (the XLA twin stops at exactly max_iter), including caps that are not
    multiples of the kernel CHUNK size."""
    args = _rand_soft(7)
    sol = solve_qp_soft(*args, max_iter=max_iter)
    assert int(sol.iters) <= max_iter


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fused_matches_xla(interp, monkeypatch, seed):
    args = _rand_soft(seed)
    assert pallas_ipm.fused_ok(6, 10, 5, jnp.float32)
    fused = solve_qp_soft(*args)
    ref = _xla_solve(args, monkeypatch)
    assert int(ref.status) == 0
    assert int(fused.status) == 0, float(fused.gap)
    np.testing.assert_allclose(np.asarray(fused.z), np.asarray(ref.z),
                               atol=2e-3)
    # both converged to the same KKT quality
    assert float(fused.gap) < 3e-2
    # full carried state matches too (warm starts depend on it)
    for a, b in zip(fused.state, ref.state):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-2, rtol=5e-2)


def test_fused_bench_shape(interp, monkeypatch):
    """Condensed-MPC-like shape: many near-duplicate hard rows + soft rows."""
    args = _rand_soft(9, nU=12, mh=384, ms=64, tight=False)
    fused = solve_qp_soft(*args)
    ref = _xla_solve(args, monkeypatch)
    assert int(fused.status) == 0 and int(ref.status) == 0
    np.testing.assert_allclose(np.asarray(fused.z), np.asarray(ref.z),
                               atol=2e-3)


def test_fused_warm_start(interp, monkeypatch):
    args = _rand_soft(4)
    sol0 = solve_qp_soft(*args)
    args2 = list(args)
    args2[1] = args[1] + 1e-3
    warm = solve_qp_soft(*args2, ws=sol0.state, ws_valid=jnp.asarray(True))
    ref = _xla_solve(args2, monkeypatch)
    ref_warm = _xla_solve(args2, monkeypatch, ws=sol0.state,
                          ws_valid=jnp.asarray(True))
    assert int(warm.status) == 0
    np.testing.assert_allclose(np.asarray(warm.z), np.asarray(ref.z),
                               atol=2e-3)
    # same warm-start trajectory as the XLA twin (fp noise may add an iter)
    assert abs(int(warm.iters) - int(ref_warm.iters)) <= 2


def test_gate_rejects_f64_and_sharded():
    assert not pallas_ipm.fused_ok(6, 10, 5, jnp.float64)
    assert not pallas_ipm.fused_ok(6, 10, 0, jnp.float32)   # no soft rows
    assert not pallas_ipm.fused_ok(200, 10, 5, jnp.float32)  # nU too big
    # f64 input must still solve through the XLA path
    args = _rand_soft(0)
    args = [a.astype(jnp.float64) for a in args]
    sol = solve_qp_soft(*args)
    assert int(sol.status) == 0
