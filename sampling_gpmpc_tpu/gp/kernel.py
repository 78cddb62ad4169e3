"""ARD-RBF kernels with derivative observations.

From-scratch closed forms for the value/gradient cross-covariances that the
reference gets from GPyTorch's ``RBFKernelGrad`` (ref: src/GP_model.py:50-91).
For the kernel k(x,z) = s * exp(-0.5 * sum_d (x_d-z_d)^2 / l_d^2):

    cov(f(x), f(z))             = k
    cov(f(x), df(z)/dz_e)       = d k / d z_e   =  k * (x_e-z_e)/l_e^2
    cov(df(x)/dx_d, f(z))       = d k / d x_d   = -k * (x_d-z_d)/l_d^2
    cov(df(x)/dx_d, df(z)/dz_e) = d2k/dx_d dz_e =  k * (I_de/l_d^2
                                                   - (x_d-z_d)(x_e-z_e)/(l_d^2 l_e^2))

Rows/columns are laid out point-major ("interleaved"): for each point the
(1+D) tasks [value, d/dx_1, ..., d/dx_D] are contiguous — the same ordering
GPyTorch uses, so epistemic base-sample tensors flatten identically.

Everything is plain jnp broadcasting: XLA fuses the block assembly into the
surrounding matmuls; no Pallas is needed for these shapes (R ~ 50-500).
"""

from __future__ import annotations

import jax.numpy as jnp


def rbf(X: jnp.ndarray, Z: jnp.ndarray, lengthscale, outputscale) -> jnp.ndarray:
    """Plain RBF kernel matrix. X: (N, D), Z: (M, D) -> (N, M)."""
    ls = jnp.asarray(lengthscale, X.dtype)
    diff = (X[:, None, :] - Z[None, :, :]) / ls
    return jnp.asarray(outputscale, X.dtype) * jnp.exp(
        -0.5 * jnp.sum(diff * diff, axis=-1))


def rbf_grad(X: jnp.ndarray, Z: jnp.ndarray, lengthscale, outputscale) -> jnp.ndarray:
    """Derivative-kernel matrix.

    Args:
        X: (N, D) left points; Z: (M, D) right points.
    Returns:
        (N*(1+D), M*(1+D)) covariance over [value, gradient] tasks,
        point-major interleaved.
    """
    N, D = X.shape
    M = Z.shape[0]
    ls = jnp.asarray(lengthscale, X.dtype)
    inv_ls2 = 1.0 / (ls * ls)
    diff = X[:, None, :] - Z[None, :, :]              # (N, M, D)
    delta = diff * inv_ls2                            # (N, M, D)
    k = jnp.asarray(outputscale, X.dtype) * jnp.exp(
        -0.5 * jnp.sum(diff * delta, axis=-1))        # (N, M)

    blk = jnp.zeros((N, 1 + D, M, 1 + D), X.dtype)
    blk = blk.at[:, 0, :, 0].set(k)
    blk = blk.at[:, 0, :, 1:].set(k[..., None] * delta)
    blk = blk.at[:, 1:, :, 0].set(-jnp.swapaxes(k[..., None] * delta, 1, 2))
    hess = k[..., None, None] * (
        jnp.diag(inv_ls2)[None, None] - delta[..., :, None] * delta[..., None, :])
    blk = blk.at[:, 1:, :, 1:].set(jnp.swapaxes(hess, 1, 2))
    return blk.reshape(N * (1 + D), M * (1 + D))


def kernel_matrix(X, Z, lengthscale, outputscale, with_grad: bool) -> jnp.ndarray:
    if with_grad:
        return rbf_grad(X, Z, lengthscale, outputscale)
    return rbf(X, Z, lengthscale, outputscale)
