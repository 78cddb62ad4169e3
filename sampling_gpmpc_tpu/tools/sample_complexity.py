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


def _psd_factor(cov):
    """F with cov = F F^T via eigendecomposition, clipping the tiny negative
    eigenvalues a near-singular posterior produces (dense grids make the
    covariance rank-deficient — the reference hits the same wall and calls
    it "N_max = 8, maximum such that matrix is still psd"; clipping is the
    exact PSD projection and never NaNs)."""
    w, V = jnp.linalg.eigh(cov)
    return V * jnp.sqrt(jnp.clip(w, 0.0))[None, :]


def max_deviation_samples(Z, y, grid, lengthscale, outputscale, lam,
                          n_samples, key) -> np.ndarray:
    """Per-sample sup-norm deviation of GP draws from the posterior mean."""
    mean, cov = _posterior_on_grid(Z, y, grid, lengthscale, outputscale, lam)
    F = _psd_factor(cov)
    eps = jax.random.normal(key, (n_samples, grid.shape[0]), mean.dtype)
    return np.asarray(jnp.max(jnp.abs(eps @ F.T), axis=1))


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


# ---------------------------------------------------------------------------
# Change-of-measure constant C_D and the full N(delta) pipeline
# (ref: extra/compute_num_samples/num_of_samples.py:36-73, helper.py:90-117)


def posterior_mean_at_train(Z, y, lengthscale, outputscale, lam):
    """GP posterior mean evaluated AT the training inputs."""
    Z, y = jnp.asarray(Z), jnp.asarray(y)
    K = rbf(Z, Z, lengthscale, outputscale)
    A = K + lam * jnp.eye(K.shape[0], dtype=K.dtype)
    return K @ jnp.linalg.solve(A, y)


def posterior_norm_diff(Z, y, lengthscale, outputscale, lam, lam_total,
                        w_bound) -> float:
    """sum_i (|mu(z_i) - y_i| + w_bound)^2 / lam_total — the data-fit term
    of the change-of-measure exponent (ref: helper.py:90-117)."""
    mu = posterior_mean_at_train(Z, y, lengthscale, outputscale, lam)
    diff = jnp.abs(mu - jnp.asarray(y))
    return float(jnp.sum((diff + w_bound) ** 2) / lam_total)


def change_of_measure_cd(Z, y, Z_dense, y_dense, lengthscale, outputscale,
                         lam, lam_total, w_bound) -> dict:
    """The exponent C_D of the measure shift between the GP prior centered
    at the posterior mean and the true-function small ball: samples drawn
    from the N-point posterior land in the eps-ball around the TRUE function
    with probability >= exp(-C_D) * B_phi (ref: num_of_samples.py:36-56).

    ``(Z_dense, y_dense)`` is a denser evaluation of the same function used
    as the finite-data stand-in for the true RKHS norm ||f||^2 (the
    reference uses a 10x-denser training grid, num_of_samples.py:31-37).

    Returns a dict with every term so tools can report them individually.
    """
    Zj, yj = jnp.asarray(Z), jnp.asarray(y)
    K = rbf(Zj, Zj, lengthscale, outputscale)
    A = K + lam * jnp.eye(K.shape[0], dtype=K.dtype)
    alpha = jnp.linalg.solve(A, yj)
    mean_norm = float(yj @ alpha)
    true_norm = rkhs_norm(Z_dense, y_dense, lengthscale, outputscale, lam)
    cross = float(2.0 * (yj @ alpha))
    l1 = float(jnp.sum(jnp.abs(alpha)))
    fit = posterior_norm_diff(Z, y, lengthscale, outputscale, lam,
                              lam_total, w_bound)
    cd = true_norm + mean_norm - cross + l1 * w_bound + 0.5 * fit
    return {"Cd": cd, "true_norm": true_norm, "mean_norm": mean_norm,
            "cross": cross, "alpha_l1": l1, "fit_term": fit}


def num_samples_with_measure_shift(Cd: float, p_ball: float,
                                   delta: float = 0.001) -> float:
    """N(delta) = log(delta) / log(1 - exp(-Cd) * B_phi): dynamics samples
    so that with prob >= 1-delta at least one GP function-sample is
    uniformly eps-close to the true dynamics (ref: num_of_samples.py:69)."""
    p_eff = float(np.exp(-Cd) * p_ball)
    if p_eff <= 0.0:
        return float("inf")
    if p_eff >= 1.0:
        return 1.0
    return float(np.log(delta) / np.log(1.0 - p_eff))


def gp_input_grid(spec, data, n_grid: int) -> np.ndarray:
    """Tensor grid over the GP input box: the [x_min,x_max]x[u_min,u_max]
    ranges restricted to ``g_idx_inputs`` (ref: helper.py:171-210 builds
    exactly these per-env ranges by hand; here the env protocol's input
    filter makes it generic)."""
    lo_full = np.concatenate([data.x_min, data.u_min])
    hi_full = np.concatenate([data.x_max, data.u_max])
    idx = np.asarray(spec.g_idx_inputs)
    axes = [np.linspace(lo_full[i], hi_full[i], n_grid) for i in idx]
    mesh = np.meshgrid(*axes, indexing="ij")
    return np.stack([m.ravel() for m in mesh], axis=-1)


def max_deviation_samples_chunked(Z, y, grid, lengthscale, outputscale, lam,
                                  n_samples, key, chunk: int = 8192):
    """Per-draw sup-norm deviations, drawn in jitted chunks so millions of
    draws never materialize at once (the reference draws 1e6-1e7 at once
    on a 24 GB GPU, helper.py:228-233; here only (chunk, n_grid) lives on
    device per step)."""
    mean, cov = _posterior_on_grid(Z, y, grid, lengthscale, outputscale, lam)
    F = _psd_factor(cov)

    @jax.jit
    def draw(k):
        eps = jax.random.normal(k, (chunk, grid.shape[0]), mean.dtype)
        return jnp.max(jnp.abs(eps @ F.T), axis=1)

    n_chunks = -(-n_samples // chunk)
    out = [np.asarray(draw(jax.random.fold_in(key, c)))
           for c in range(n_chunks)]
    return np.concatenate(out)[:n_samples]
