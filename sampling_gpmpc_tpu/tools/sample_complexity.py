"""Finite-sample-theory calculators (E3).

Re-derivation of extra/compute_num_samples/helper.py on the JAX GP core:
RKHS norm of the posterior mean, information-gain beta, and the
small-ball probability / epsilon(N) quantities of the finite-sample
reachability theory — the empirical probability that a GP function sample
stays within eps of the posterior mean uniformly over a grid, and the
quantile eps achieving a target probability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sampling_gpmpc_tpu.gp.kernel import rbf


def rkhs_norm(Z, y, lengthscale, outputscale, lam) -> float:
    """||mu||_k^2 = y'(K + lam I)^-1 y (ref: helper.py:39-87)."""
    K = rbf(jnp.asarray(Z), jnp.asarray(Z), lengthscale, outputscale)
    A = K + lam * jnp.eye(K.shape[0], dtype=K.dtype)
    alpha = jnp.linalg.solve(A, jnp.asarray(y))
    return float(jnp.dot(jnp.asarray(y), alpha))


def info_beta(Z, lengthscale, outputscale, lam, delta_term=9.21) -> float:
    """Information-gain confidence multiplier
    sqrt(logdet(K/lam + I) + 2 log(1/delta)) (ref: helper.py:81-82)."""
    K = rbf(jnp.asarray(Z), jnp.asarray(Z), lengthscale, outputscale)
    sign, logdet = jnp.linalg.slogdet(
        K / lam + jnp.eye(K.shape[0], dtype=K.dtype))
    return float(jnp.sqrt(logdet + delta_term))


def _posterior_on_grid(Z, y, grid, lengthscale, outputscale, lam):
    Z, y, grid = map(jnp.asarray, (Z, y, grid))
    K = rbf(Z, Z, lengthscale, outputscale)
    A = K + lam * jnp.eye(K.shape[0], dtype=K.dtype)
    L = jnp.linalg.cholesky(A)
    Kx = rbf(grid, Z, lengthscale, outputscale)
    mean = Kx @ jax.scipy.linalg.cho_solve((L, True), y)
    V = jax.scipy.linalg.solve_triangular(L, Kx.T, lower=True)
    cov = rbf(grid, grid, lengthscale, outputscale) - V.T @ V
    cov = 0.5 * (cov + cov.T)
    return mean, cov


def max_deviation_samples(Z, y, grid, lengthscale, outputscale, lam,
                          n_samples, key) -> np.ndarray:
    """Per-sample sup-norm deviation of GP draws from the posterior mean."""
    mean, cov = _posterior_on_grid(Z, y, grid, lengthscale, outputscale, lam)
    Lc = jnp.linalg.cholesky(cov + 1e-10 * jnp.eye(cov.shape[0],
                                                   dtype=cov.dtype))
    eps = jax.random.normal(key, (n_samples, grid.shape[0]), mean.dtype)
    draws = mean[None] + eps @ Lc.T
    return np.asarray(jnp.max(jnp.abs(draws - mean[None]), axis=1))


def small_ball_probability(Z, y, grid, lengthscale, outputscale, lam, eps,
                           n_samples=2000, key=None) -> float:
    """P(sup_grid |f - mu| <= eps) estimated over posterior draws
    (ref: helper.py:116-245)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    dev = max_deviation_samples(Z, y, grid, lengthscale, outputscale, lam,
                                n_samples, key)
    return float(np.mean(dev <= eps))


def epsilon_for_probability(Z, y, grid, lengthscale, outputscale, lam, prob,
                            n_samples=2000, key=None) -> float:
    """Quantile eps(N): smallest eps with small-ball probability >= prob
    (ref: helper.py:368-469)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    dev = max_deviation_samples(Z, y, grid, lengthscale, outputscale, lam,
                                n_samples, key)
    return float(np.quantile(dev, prob))


def num_samples_for_coverage(p_ball: float, delta: float = 0.05) -> int:
    """Samples N with P(at least one draw in the eps-ball) >= 1 - delta:
    N >= log(delta) / log(1 - p_ball)."""
    if p_ball <= 0:
        return np.iinfo(np.int64).max
    if p_ball >= 1:
        return 1
    return int(np.ceil(np.log(delta) / np.log(1.0 - p_ball)))
