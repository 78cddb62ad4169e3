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


def _kkt_residual_f64(args, sol):
    """Independent f64 KKT residual of a returned iterate on the ORIGINAL
    (un-equilibrated) problem data — pins 'status 0' to real convergence,
    not just to the solver's own internally-scaled bookkeeping."""
    H, g, G_h, d_h, G_s, lo, hi, zl, zu, Zl, Zu = [
        np.asarray(a, np.float64) for a in args]
    u, sl, su, th, lh, tU, lU, tL, lL, nl, nu = [
        np.asarray(a, np.float64) for a in sol.state]
    qscale = 1.0 + np.max(np.abs(g)) + np.max(zl)
    r_stat = np.max(np.abs(H @ u + g + G_h.T @ lh + G_s.T @ (lU - lL)))
    r_soft = max(np.max(np.abs(Zl * sl + zl - lL - nl)),
                 np.max(np.abs(Zu * su + zu - lU - nu)))
    r_prim = max(np.max(np.abs(G_h @ u + th - d_h) / (1 + np.abs(d_h))),
                 np.max(np.abs(G_s @ u - su + tU - hi) / (1 + np.abs(hi))),
                 np.max(np.abs(-(G_s @ u) - sl + tL + lo) / (1 + np.abs(lo))))
    m = d_h.shape[0] + 4 * lo.shape[0]
    compl = th @ lh + tU @ lU + tL @ lL + sl @ nl + su @ nu
    return max((r_stat + r_soft) / qscale, r_prim, compl / (m * qscale))


def test_fused_warm_start(interp, monkeypatch):
    args = _rand_soft(4)
    sol0 = solve_qp_soft(*args)
    args2 = list(args)
    args2[1] = args[1] + 1e-3
    warm = solve_qp_soft(*args2, ws=sol0.state, ws_valid=jnp.asarray(True))
    ref_warm = _xla_solve(args2, monkeypatch, ws=sol0.state,
                          ws_valid=jnp.asarray(True))
    assert int(warm.status) == 0
    # engine equivalence: the fused kernel reproduces the XLA twin's warm
    # trajectory (same algorithm, same warm-point assembly).  NOTE: warm
    # and cold solves legitimately land at DIFFERENT points of the f32
    # tolerance ball (KKT <= 3e-5 allows ~1e-2 spread in z on this
    # conditioning) — the old warm-vs-cold comparison over-asked.
    np.testing.assert_allclose(np.asarray(warm.z), np.asarray(ref_warm.z),
                               atol=2e-4)
    # same warm-start trajectory as the XLA twin (fp noise may add an iter)
    assert abs(int(warm.iters) - int(ref_warm.iters)) <= 2
    # ... and 'converged' must survive an independent f64 KKT audit on the
    # original data (both engines, warm and cold)
    for sol in (warm, ref_warm, sol0):
        assert _kkt_residual_f64(args2 if sol is not sol0 else args,
                                 sol) < 5e-4


def test_gate_rejects_f64_and_sharded():
    assert not pallas_ipm.fused_ok(6, 10, 5, jnp.float64)
    assert not pallas_ipm.fused_ok(6, 10, 0, jnp.float32)   # no soft rows
    assert not pallas_ipm.fused_ok(200, 10, 5, jnp.float32)  # nU too big
    # f64 input must still solve through the XLA path
    args = _rand_soft(0)
    args = [a.astype(jnp.float64) for a in args]
    sol = solve_qp_soft(*args)
    assert int(sol.status) == 0
