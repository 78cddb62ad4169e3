"""Lane-batched Pallas Cholesky / triangular solves vs the XLA oracles.

Kernels run in interpreter mode here (CPU test mesh); the TPU path compiles
the same kernel body.  Tolerances are f32-scale because the kernels are the
f32 production path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sampling_gpmpc_tpu.ops import batch_linalg as bl


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(bl, "_INTERPRET", True)


def _spd(rng, b, n, dtype=np.float32):
    A = rng.standard_normal((b, n, n)).astype(dtype)
    return A @ np.swapaxes(A, 1, 2) + n * np.eye(n, dtype=dtype)


def test_chol_matches_xla():
    rng = np.random.default_rng(0)
    A = _spd(rng, 5, 24)
    L_ref = np.linalg.cholesky(A)
    L = jax.vmap(bl.chol)(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(L), L_ref, rtol=2e-4, atol=2e-4)
    assert np.all(np.triu(np.asarray(L), 1) == 0.0)


def test_chol_nested_vmap_folds():
    rng = np.random.default_rng(1)
    A = _spd(rng, 6, 20).reshape(3, 2, 20, 20)
    L = jax.vmap(jax.vmap(bl.chol))(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(L), np.linalg.cholesky(A),
                               rtol=2e-4, atol=2e-4)


def test_chol_lane_padding():
    """Batch not a multiple of 128 pads; padded lanes must not contaminate."""
    rng = np.random.default_rng(2)
    A = _spd(rng, 3, 17)
    L = jax.vmap(bl.chol)(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(L), np.linalg.cholesky(A),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("transposed", [False, True])
@pytest.mark.parametrize("m", [1, 7])
def test_tri_solve_matches_xla(transposed, m):
    rng = np.random.default_rng(3)
    b, n = 4, 24
    L = np.linalg.cholesky(_spd(rng, b, n))
    R = rng.standard_normal((b, n, m)).astype(np.float32)
    X = jax.vmap(lambda Li, Ri: bl.tri_solve(
        Li, Ri, lower_factor_transposed=transposed))(
        jnp.asarray(L), jnp.asarray(R))
    import scipy.linalg
    X_ref = np.stack([
        scipy.linalg.solve_triangular(L[i], R[i], lower=True,
                                      trans=1 if transposed else 0)
        for i in range(b)])
    np.testing.assert_allclose(np.asarray(X), X_ref, rtol=3e-4, atol=3e-4)


def test_tri_solve_vector_rhs():
    rng = np.random.default_rng(4)
    b, n = 3, 20
    L = np.linalg.cholesky(_spd(rng, b, n))
    r = rng.standard_normal((b, n)).astype(np.float32)
    x = jax.vmap(lambda Li, ri: bl.tri_solve(Li, ri))(
        jnp.asarray(L), jnp.asarray(r))
    import scipy.linalg
    x_ref = np.stack([scipy.linalg.solve_triangular(L[i], r[i], lower=True)
                      for i in range(b)])
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=3e-4, atol=3e-4)


def test_tri_solve_shared_factor_falls_back():
    """Unbatched L routes to XLA (shared real-data factor path)."""
    rng = np.random.default_rng(5)
    n, m = 20, 5
    L = jnp.asarray(np.linalg.cholesky(_spd(rng, 1, n)[0]))
    R = jnp.asarray(rng.standard_normal((6, n, m)).astype(np.float32))
    X = jax.vmap(lambda Ri: bl.tri_solve(L, Ri))(R)
    import scipy.linalg
    X_ref = np.stack([scipy.linalg.solve_triangular(
        np.asarray(L), np.asarray(R)[i], lower=True) for i in range(6)])
    np.testing.assert_allclose(np.asarray(X), X_ref, rtol=3e-4, atol=3e-4)


def test_unbatched_chol_plain():
    rng = np.random.default_rng(6)
    A = _spd(rng, 1, 12)[0]
    np.testing.assert_allclose(np.asarray(bl.chol(jnp.asarray(A))),
                               np.linalg.cholesky(A), rtol=2e-4, atol=2e-4)
