"""Train-axis-sharded exact GP posterior (E8).

TPU-native equivalent of the reference's multi-GPU kernel-sharding
experiment (ref: extra/multi_gpu.py:64-66 ``MultiDeviceKernel``; the
commented production hook at src/GP_model.py:76-81): when the GP
conditioning set outgrows one device, shard the TRAINING-POINT axis over a
mesh axis and never materialize the full kernel matrix on any chip.

GPyTorch's MultiDeviceKernel splits kernel ROWS across GPUs and runs CG
with distributed matvecs; the same layout is idiomatic here as a
``shard_map`` over the train axis:

  * each device holds its point block ``Z_i`` of training inputs (the
    test/query side is small and replicated),
  * one matvec  w_i = K(Z_i, Z) v  builds only the (R/p, R) row block
    per device — O(R^2/p) memory — with ``v`` replicated via all_gather,
  * conjugate gradients run on the row-sharded vectors; the two dot
    products per iteration are ``psum`` reductions over the mesh axis
    (the only cross-chip traffic beyond the all_gather of the search
    direction),
  * posterior mean  K(X, Z) alpha  and the covariance correction
    K(X, Z) K^-1 K(Z, X)  are psum-reduced shard-local products.

Derivative-observation kernels reuse :func:`gp.kernel.kernel_matrix`:
each training point contributes its (1+D)-task row group to the
shard-local block, so observation vectors are sharded in point blocks too.

For the shipped configs the per-(sample, output) conditioning sets are
small (R <= ~400 rows) and the dense Cholesky path in ``gp/exact.py`` is
faster — this module is the scaling escape hatch the reference only
prototyped, exercised against the dense path in
``tests/test_train_sharded.py`` on the virtual 8-device mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sampling_gpmpc_tpu.gp.kernel import kernel_matrix
from sampling_gpmpc_tpu.setup import full_precision


def _cg(matvec, gather, b_local, axis, tol, max_iter):
    """Conjugate gradients on row-sharded vectors; dot products psum over
    the train axis."""

    def pdot(a, b):
        return jax.lax.psum(jnp.sum(a * b), axis)

    x = jnp.zeros_like(b_local)
    r = b_local
    p = b_local
    rs = pdot(r, r)

    def body(carry):
        x, r, p, rs, it = carry
        Ap = matvec(gather(p))
        alpha = rs / pdot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = pdot(r, r)
        p = r + (rs_new / rs) * p
        return x, r, p, rs_new, it + 1

    def cond(carry):
        _, _, _, rs, it = carry
        return (rs > tol * tol) & (it < max_iter)

    x, _, _, _, it = jax.lax.while_loop(
        cond, body, (x, r, p, rs, jnp.asarray(0)))
    return x, it


def sharded_posterior_fn(mesh: Mesh, axis: str, lengthscale, outputscale,
                         with_grad: bool, tol: float = 1e-10,
                         max_iter: int = 1000):
    """Build a jittable sharded-posterior function over ``mesh[axis]``.

    Returns ``f(Z, y, noise_rows, X) -> (mean, cov)``:
        Z (R_pts, D)          training inputs, sharded over the train axis
                              (R_pts must divide the axis size),
        y (R_rows,)           observations in point-major task layout,
        noise_rows (R_rows,)  per-row observation noise (task noises in),
        X (M, D)              replicated query points.
    """
    try:
        from jax import shard_map
    except ImportError:          # older jax
        from jax.experimental.shard_map import shard_map

    def inner(Z_loc, y_loc, noise_loc, X):
        Z_full = jax.lax.all_gather(Z_loc, axis).reshape(
            -1, Z_loc.shape[-1])
        n_loc = y_loc.shape[0]
        idx = jax.lax.axis_index(axis)

        def matvec(v_full):
            K_loc = kernel_matrix(Z_loc, Z_full, lengthscale, outputscale,
                                  with_grad)
            v_mine = jax.lax.dynamic_slice_in_dim(v_full, idx * n_loc,
                                                  n_loc)
            return K_loc @ v_full + noise_loc * v_mine

        def gather(v_local):
            return jax.lax.all_gather(v_local, axis).reshape(-1)

        alpha_loc, _ = _cg(matvec, gather, y_loc, axis, tol, max_iter)

        # mean: psum of shard-local K(X, Z_loc) @ alpha_loc
        K_xz_loc = kernel_matrix(X, Z_loc, lengthscale, outputscale,
                                 with_grad)
        mean = jax.lax.psum(K_xz_loc @ alpha_loc, axis)

        # covariance: K_xx - K_xZ K^-1 K_Zx, one CG solve per test column.
        # The right-hand sides K(Z, x_j) are row-sharded = K_xz_loc columns.
        def solve_col(col_local):
            s, _ = _cg(matvec, gather, col_local, axis, tol, max_iter)
            return s

        S_loc = jax.vmap(solve_col, in_axes=1, out_axes=1)(K_xz_loc.T)
        corr = jax.lax.psum(K_xz_loc @ S_loc, axis)
        K_xx = kernel_matrix(X, X, lengthscale, outputscale, with_grad)
        cov = K_xx - corr
        return mean, 0.5 * (cov + cov.T)

    fn = shard_map(inner, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(axis), P()),
                   out_specs=(P(), P()),
                   check_vma=False)

    @full_precision
    def wrapped(Z, y, noise_rows, X):
        # full-f32 matmul precision is load-bearing here like every other
        # GP posterior entry point (CLAUDE.md): the CG matvecs and the
        # cov = K_xx - corr cancellation cannot survive bf16 passes
        Z = jax.device_put(Z, NamedSharding(mesh, P(axis)))
        y = jax.device_put(y, NamedSharding(mesh, P(axis)))
        noise_rows = jax.device_put(noise_rows, NamedSharding(mesh, P(axis)))
        X = jax.device_put(X, NamedSharding(mesh, P()))
        return fn(Z, y, noise_rows, X)

    return wrapped
