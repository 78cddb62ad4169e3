"""Bayesian linear regression over feature maps (approx sampling MPC).

Per output j the dynamics are modeled as  x+_j = phi_j(x, u) @ w_j  with a
Gaussian weight posterior from ridge-regularized least squares
(ref: extra/approx_sampling_mpc/src/agent.py:793-885):

    A = Phi'Phi + lambda I,   mu = A^{-1} Phi'y,   Sigma = noise_var A^{-1}.

Weight *samples* define sampled dynamics realizations; the mean weights
give the nominal model.  Feature dims differ per output, so weights are
stored zero-padded to the max dim with a mask.
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class BLRPosterior(NamedTuple):
    mu: jnp.ndarray      # (g_ny, F) zero-padded means
    chol: jnp.ndarray    # (g_ny, F, F) padded Cholesky factors of Sigma
    mask: jnp.ndarray    # (g_ny, F) valid-feature mask


class BLRStats(NamedTuple):
    """Host-side per-output sufficient statistics of the weight posterior.

    A_j = Phi_j'Phi_j + lambda I,  b_j = Phi_j'y_j — enough to rebuild the
    posterior exactly and to absorb new observations as rank-1 updates
    (active learning, ref: extra/approx_sampling_mpc/src/agent.py:270-273
    re-fits on the concatenated dataset; conjugacy makes that a rank-1
    precision update here).
    """
    A: tuple     # per-output (F_j, F_j) numpy
    b: tuple     # per-output (F_j,) numpy


def stats_fit(feats: List, X: np.ndarray, Y: np.ndarray,
              lambda_reg: float) -> BLRStats:
    """Sufficient statistics from a batch dataset.

    Args:
        feats: list of per-output feature fns phi_j(x, u).
        X: (N, nx+nu) training inputs; Y: (N, g_ny) next-state targets.
    """
    nx = Y.shape[1]
    As, bs = [], []
    for j, f in enumerate(feats):
        Phi = np.asarray(jax.vmap(lambda z: f(z[:nx], z[nx:]))(
            jnp.asarray(X)))
        As.append(Phi.T @ Phi + lambda_reg * np.eye(Phi.shape[1]))
        bs.append(Phi.T @ Y[:, j])
    return BLRStats(A=tuple(As), b=tuple(bs))


def stats_update(stats: BLRStats, feats: List, x, u,
                 y: np.ndarray) -> BLRStats:
    """Absorb ONE observed transition (x, u) -> y (rank-1 per output)."""
    phis = [np.asarray(f(jnp.asarray(x), jnp.asarray(u))) for f in feats]
    return BLRStats(
        A=tuple(A + np.outer(p, p) for A, p in zip(stats.A, phis)),
        b=tuple(b + p * y[j] for j, (b, p) in enumerate(
            zip(stats.b, phis))))


def posterior_from_stats(stats: BLRStats, noise_var: float,
                         dtype=jnp.float64) -> BLRPosterior:
    """Padded weight posterior  mu = A^-1 b,  Sigma = noise_var A^-1."""
    per = []
    F = 0
    for A, b in zip(stats.A, stats.b):
        mu = np.linalg.solve(A, b)
        Sigma = noise_var * np.linalg.inv(A)
        L = np.linalg.cholesky(Sigma + 1e-18 * np.eye(A.shape[0]))
        per.append((mu, L))
        F = max(F, A.shape[0])
    mus, chols, masks = [], [], []
    for mu, L in per:
        d = mu.shape[0]
        mu_p = np.zeros(F)
        mu_p[:d] = mu
        L_p = np.zeros((F, F))
        L_p[:d, :d] = L
        m = np.zeros(F)
        m[:d] = 1.0
        mus.append(mu_p)
        chols.append(L_p)
        masks.append(m)
    return BLRPosterior(mu=jnp.asarray(np.stack(mus), dtype),
                        chol=jnp.asarray(np.stack(chols), dtype),
                        mask=jnp.asarray(np.stack(masks), dtype))


def fit(feats: List, X: np.ndarray, Y: np.ndarray, lambda_reg: float,
        noise_var: float, dtype=jnp.float64) -> BLRPosterior:
    """Fit per-output weight posteriors (batch convenience wrapper)."""
    return posterior_from_stats(stats_fit(feats, X, Y, lambda_reg),
                                noise_var, dtype)


def sample_weights(post: BLRPosterior, key, n: int) -> jnp.ndarray:
    """(n, g_ny, F) weight draws w = mu + L z (ref: agent.py:821-848)."""
    g_ny, F = post.mu.shape
    z = jax.random.normal(key, (n, g_ny, F), post.mu.dtype)
    return post.mu[None] + jnp.einsum("jab,njb->nja", post.chol, z)


def make_dynamics(feats, nx: int):
    """Weight-parameterized dynamics step and value+jacobian rows.

    Returns:
        step(x, u, W): next state for weights W (g_ny, F).
        val_jac(x, u, W): (nx, 1+nx+nu) rows [value, d/dx, d/du].
    """
    def step(x, u, W):
        outs = [jnp.dot(f(x, u), W[j, :f(x, u).shape[0]])
                for j, f in enumerate(feats)]
        return jnp.stack(outs)

    def val_jac(x, u, W):
        val = step(x, u, W)
        Jx = jax.jacfwd(step, argnums=0)(x, u, W)
        Ju = jax.jacfwd(step, argnums=1)(x, u, W)
        return jnp.concatenate([val[:, None], Jx, Ju], axis=1)

    return step, val_jac


def rollout(step, x0, U, W):
    """Propagate weights W from x0 under inputs U: (H+1, nx)."""
    def body(x, u):
        xn = step(x, u, W)
        return xn, xn

    _, X = jax.lax.scan(body, x0, U)
    return jnp.concatenate([x0[None], X], axis=0)
