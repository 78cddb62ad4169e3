"""Pallas batched Cholesky for small SPD matrices (EXPERIMENTAL).

STATUS: the kernel is numerically validated in interpreter mode, but the
Mosaic compile of the (n, n) fori-loop carry is currently pathologically
slow through this image's remote-compile path, so the production GP path
keeps XLA's batched Cholesky (see BENCH_NOTES.md headroom notes).
``batched_cholesky`` therefore defaults to the XLA implementation unless
``use_pallas=True`` is requested explicitly.

The GP conditioning path factors large *batches* of small matrices
(ns*g_ny x R x R with R ~ 60-200) — a shape where XLA's LAPACK-style
batched Cholesky leaves TPU throughput on the table.  This kernel keeps
each matrix resident in VMEM and performs a right-looking factorization
with masked rank-1 trailing updates on the VPU; the grid runs over the
batch so matrices factor independently.

Masked-row semantics are inherited from the caller (identity rows/cols
stay identity under the factorization).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_kernel(a_ref, o_ref, *, n: int, jitter: float):
    # mask-only arithmetic: Pallas TPU has no dynamic_slice on values, so
    # column extraction / pivot reads are masked reductions and the factor
    # accumulates as rank-1 outer products
    A = a_ref[0] + jitter * jnp.eye(n, dtype=a_ref.dtype)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(j, carry):
        A, L = carry
        cmask = (col_ids == j).astype(A.dtype)                 # (1, n)
        rmask = (row_ids == j).astype(A.dtype)                 # (n, 1)
        pivot = jax.lax.rsqrt(jnp.sum(A * rmask * cmask))
        colv = jnp.sum(A * cmask, axis=1, keepdims=True) * pivot  # (n, 1)
        lcol = jnp.where(row_ids >= j, colv, 0.0)
        lstrict = jnp.where(row_ids > j, colv, 0.0)
        A = A - lstrict @ lstrict.T        # trailing update (rows/cols <= j
        #                                    stale but never re-read)
        L = L + lcol @ cmask               # deposit column j of the factor
        return A, L

    _, L = jax.lax.fori_loop(
        0, n, body, (A, jnp.zeros((n, n), A.dtype)))
    o_ref[0] = L


@functools.partial(jax.jit, static_argnames=("jitter", "use_pallas"))
def batched_cholesky(A: jnp.ndarray, jitter: float = 0.0,
                     use_pallas: bool = False) -> jnp.ndarray:
    """Cholesky of a batch of SPD matrices: (..., n, n) -> lower (..., n, n)."""
    shape = A.shape
    n = shape[-1]
    batch = 1
    for s in shape[:-2]:
        batch *= s
    A3 = A.reshape(batch, n, n)

    if not use_pallas or jax.devices()[0].platform not in ("tpu", "axon"):
        L = jnp.linalg.cholesky(
            A3 + jitter * jnp.eye(n, dtype=A.dtype)[None])
        return L.reshape(shape)

    out = pl.pallas_call(
        functools.partial(_chol_kernel, n=n, jitter=jitter),
        grid=(batch,),
        in_specs=[pl.BlockSpec((1, n, n), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n, n), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, n, n), A.dtype),
    )(A3)
    return out.reshape(shape)
