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

    # pure-broadcast block assembly: every block is built in its final
    # (N, left-task, M, right-task) position and joined by two concats, so
    # XLA fuses the whole thing into the concat kernels.  The earlier
    # zeros + 4x .at[].set form dispatched a full-size dynamic-update (and
    # two transposes) per block — measured 0.42 ms of the 0.77 ms
    # empty-hall GP stage at the bench shape on v5e, pure launch overhead.
    # deltaT[n,d,m] == delta[n,m,d] recomputed in transposed layout
    # (identical operand values, so results stay bitwise equal).
    deltaT = (X[:, :, None] - Z.T[None, :, :]) * inv_ls2[:, None]  # (N, D, M)
    top = jnp.concatenate([k[..., None], k[..., None] * delta],
                          axis=-1)                    # (N, M, 1+D)
    lg = -k[:, None, :] * deltaT                      # (N, D, M)
    # hess[n,d,m,e] = k (I_de/l_d^2 - delta_d delta_e)
    hess = k[:, None, :, None] * (
        jnp.diag(inv_ls2)[None, :, None, :]
        - deltaT[..., None] * delta[:, None, :, :])   # (N, D, M, D)
    grad_rows = jnp.concatenate([lg[..., None], hess], axis=-1)
    blk = jnp.concatenate([top[:, None], grad_rows], axis=1)
    return blk.reshape(N * (1 + D), M * (1 + D))


def kernel_matrix(X, Z, lengthscale, outputscale, with_grad: bool) -> jnp.ndarray:
    if with_grad:
        return rbf_grad(X, Z, lengthscale, outputscale)
    return rbf(X, Z, lengthscale, outputscale)
