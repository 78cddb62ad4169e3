"""Lane-batched small-matrix Cholesky / triangular solves (Pallas TPU).

STATUS — measured alternative, NOT on the production GP path.  Steady-state
microbenchmarks on a v5e (``profiling/microbench_linalg.py``) put XLA's
batched Cholesky / triangular-solve custom-calls at the ~15-30 us dispatch
floor for the production GP-stage shapes (B=64..512, R=60..108, f32) —
the same floor these kernels hit, so there is no linalg win to be had, and
the layout ``moveaxis``/pad traffic around each Pallas call made the
end-to-end SQP bench *slower* (228 -> 148 solves/s) when gp/exact.py was
routed through them.  The GP stage is latency-bound, not compute-bound;
see BENCH_NOTES.md "Round 2 — GP-stage profiling".  Kept (tested, with an
interpreter-mode CI path) as the building block for a future fused
whole-stage kernel, where the (n, n, lanes) layout would live entirely in
VMEM and the glue cost disappears.

The layout idea: put the BATCH on the 128-wide lane axis — a batch of
SPD matrices is laid out (n, n, B) so every scalar step of the textbook
right-looking factorization / forward substitution becomes a (n,*,128)
vector op on the VPU, with the serial column loop running inside a single
VMEM-resident kernel.  Per-lane-block cost is O(n^3/1024) cycles; the grid
walks ceil(B/128) lane blocks.

Public entry points (``chol``, ``tri_solve``) are drop-in replacements for
``jnp.linalg.cholesky`` / ``jax.scipy.linalg.solve_triangular`` on ONE
matrix, wrapped in ``jax.custom_batching.custom_vmap``: under ``vmap`` they
fold all mapped axes into the lane-batched Pallas kernel (on TPU, within
size limits).  On CPU, under size limits, or with an unbatched triangular
factor they fall back to the XLA ops (bit-compatible semantics, used by
the f64 test suite).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# pallas pays off only for mid-size matrices: below ~16 the XLA loop is
# already cheap; above the cap the (n, n, 128) block overflows VMEM
MIN_N, MAX_N = 16, 180
_INTERPRET = False   # flipped by tests to exercise kernels off-TPU


def _device_platform() -> str:
    """Platform the jitted computation will actually run on.

    ``jax.default_backend()`` alone is wrong when the caller pins arrays
    to the host CPU (bench.py's CPU-baseline path does exactly that via
    ``jax.device_put(..., cpu)`` while the default backend stays the TPU
    relay), so honor an explicitly-set default device first.
    """
    dd = jax.config.jax_default_device
    if dd is not None:
        return dd.platform
    return jax.default_backend()


def _use_pallas(n: int, m: int = 1) -> bool:
    if os.environ.get("SGPMPC_NO_PALLAS"):
        return False
    if not (MIN_N <= n <= MAX_N):
        return False
    if (n * n + 2 * n * m) * LANES * 4 > 12 * 1024 * 1024:
        return False
    if _INTERPRET:
        return True
    return _device_platform() in ("tpu", "axon")


def _row_ids(n):
    return jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)


def _col_ids(n):
    return jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)


# ---------------------------------------------------------------------------
# Cholesky
# ---------------------------------------------------------------------------

def _chol_kernel(a_ref, o_ref, *, n: int):
    """In-place right-looking factorization of (n, n, LANES) SPD lanes.

    The working matrix stays symmetric in its active (rows, cols > j)
    block, so the column needed for the rank-1 update is read once as a
    column slice (rows axis) and once as a row slice (cols axis) — no
    in-kernel transpose.
    """
    o_ref[...] = a_ref[...]
    rows, cols = _row_ids(n), _col_ids(n)

    def body(j, _):
        piv = o_ref[pl.ds(j, 1), pl.ds(j, 1), :]          # (1, 1, L)
        r = jax.lax.rsqrt(piv)
        colj = o_ref[:, pl.ds(j, 1), :]                    # (n, 1, L)
        rowj = o_ref[pl.ds(j, 1), :, :]                    # (1, n, L)
        lj = jnp.where(rows >= j, colj * r, 0.0)
        f1 = jnp.where(rows > j, colj * r, 0.0)
        f2 = jnp.where(cols > j, rowj * r, 0.0)
        o_ref[...] = o_ref[...] - f1 * f2                  # trailing update
        o_ref[:, pl.ds(j, 1), :] = lj                      # deposit column j
        return 0

    jax.lax.fori_loop(0, n, body, 0, unroll=False)
    o_ref[...] = jnp.where(rows >= cols, o_ref[...], 0.0)  # clear stale upper


def _chol_lanes(A3):
    """A3: (B, n, n) -> lower Cholesky, lane-batched pallas."""
    B, n, _ = A3.shape
    Bp = -(-B // LANES) * LANES
    Al = jnp.moveaxis(A3, 0, -1)                           # (n, n, B)
    if Bp != B:
        Al = jnp.pad(Al, ((0, 0), (0, 0), (0, Bp - B)))
    out = pl.pallas_call(
        functools.partial(_chol_kernel, n=n),
        grid=(Bp // LANES,),
        in_specs=[pl.BlockSpec((n, n, LANES), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, n, LANES), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n, Bp), Al.dtype),
        interpret=_INTERPRET,
    )(Al)
    return jnp.moveaxis(out[:, :, :B], -1, 0)


@jax.custom_batching.custom_vmap
def _chol_b(A):
    """(B, n, n) -> (B, n, n) lower; folds further vmap axes into B."""
    if _use_pallas(A.shape[-1]):
        return _chol_lanes(A)
    return jnp.linalg.cholesky(A)


@_chol_b.def_vmap
def _chol_b_vmap(axis_size, in_batched, A):
    del axis_size, in_batched
    sh = A.shape
    L = _chol_b(A.reshape((-1,) + sh[-2:]))
    return L.reshape(sh), True


@jax.custom_batching.custom_vmap
def chol(A):
    """Lower Cholesky of one SPD matrix; vmap folds into the lane kernel."""
    return jnp.linalg.cholesky(A)


@chol.def_vmap
def _chol_vmap(axis_size, in_batched, A):
    del axis_size, in_batched
    return _chol_b(A), True


# ---------------------------------------------------------------------------
# Triangular solve (batched L, batched rhs)
# ---------------------------------------------------------------------------

def _tri_kernel(l_ref, r_ref, o_ref, *, n: int, m: int, lower: bool):
    """Column-oriented substitution on (n, n, L) factors, (n, m, L) rhs.

    ``lower=False`` runs backward substitution reading the upper factor's
    columns (the caller passes U = L^T pre-transposed in XLA, so both
    directions use plain column slices).
    """
    o_ref[...] = r_ref[...]
    rows = _row_ids(n)

    def step(j, _):
        piv = l_ref[pl.ds(j, 1), pl.ds(j, 1), :]           # (1, 1, L)
        xj = o_ref[pl.ds(j, 1), :, :] / piv                # (1, m, L)
        colj = l_ref[:, pl.ds(j, 1), :]                    # (n, 1, L)
        mask = (rows > j) if lower else (rows < j)
        f = jnp.where(mask, colj, 0.0)
        o_ref[...] = o_ref[...] - f * xj
        o_ref[pl.ds(j, 1), :, :] = xj
        return 0

    if lower:
        jax.lax.fori_loop(0, n, step, 0, unroll=False)
    else:
        jax.lax.fori_loop(0, n, lambda i, c: step(n - 1 - i, c), 0,
                          unroll=False)


def _tri_lanes(L3, R3, lower: bool):
    B, n, m = R3.shape[0], R3.shape[-2], R3.shape[-1]
    Bp = -(-B // LANES) * LANES
    Ll = jnp.moveaxis(L3 if lower else jnp.swapaxes(L3, -1, -2), 0, -1)
    Rl = jnp.moveaxis(R3, 0, -1)
    if Bp != B:
        Ll = jnp.pad(Ll, ((0, 0), (0, 0), (0, Bp - B)))
        Rl = jnp.pad(Rl, ((0, 0), (0, 0), (0, Bp - B)))
    out = pl.pallas_call(
        functools.partial(_tri_kernel, n=n, m=m, lower=lower),
        grid=(Bp // LANES,),
        in_specs=[pl.BlockSpec((n, n, LANES), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((n, m, LANES), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, m, LANES), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m, Bp), Rl.dtype),
        interpret=_INTERPRET,
    )(Ll, Rl)
    return jnp.moveaxis(out[:, :, :B], -1, 0)


def _tri_b_factory(lower: bool):
    @jax.custom_batching.custom_vmap
    def tri_b(L, R):
        """(B, n, n), (B, n, m) -> X with L X = R (or L^T X = R)."""
        if _use_pallas(R.shape[-2], R.shape[-1]):
            return _tri_lanes(L, R, lower)
        return jax.scipy.linalg.solve_triangular(
            L, R, lower=True, trans=0 if lower else 1)

    @tri_b.def_vmap
    def _(axis_size, in_batched, L, R):
        del axis_size
        lb, rb = in_batched
        if not lb:
            # shared factor: XLA's batched-rhs solve against one matrix is
            # already cheap (trace: the 108x108 real-data solves); XLA
            # requires matching batch ranks, so broadcast explicitly
            Lb = jnp.broadcast_to(L, R.shape[:-2] + L.shape[-2:])
            X = jax.scipy.linalg.solve_triangular(
                Lb, R, lower=True, trans=0 if lower else 1)
            return X, True
        sh = R.shape
        X = tri_b(L.reshape((-1,) + L.shape[-2:]),
                  R.reshape((-1,) + sh[-2:]))
        return X.reshape(sh), True

    return tri_b


_tri_b_lower = _tri_b_factory(True)
_tri_b_upper = _tri_b_factory(False)


def _tri_factory(lower: bool):
    tri_b = _tri_b_lower if lower else _tri_b_upper

    @jax.custom_batching.custom_vmap
    def tri(L, R):
        return jax.scipy.linalg.solve_triangular(
            L, R, lower=True, trans=0 if lower else 1)

    @tri.def_vmap
    def _(axis_size, in_batched, L, R):
        lb, rb = in_batched
        if not lb:
            Lb = jnp.broadcast_to(L, R.shape[:-2] + L.shape[-2:])
            X = jax.scipy.linalg.solve_triangular(
                Lb, R, lower=True, trans=0 if lower else 1)
            return X, True
        if not rb:
            R = jnp.broadcast_to(R[None], (axis_size,) + R.shape)
        return tri_b(L, R), True

    return tri


_tri_lower = _tri_factory(True)
_tri_upper = _tri_factory(False)


def tri_solve(L, R, *, lower_factor_transposed: bool = False):
    """Solve L X = R (or L^T X = R) for one lower factor L.

    ``R`` may be (n,) or (n, m).  Under vmap (with L batched) the solve
    runs in the lane-batched Pallas kernel on TPU; otherwise it lowers to
    ``jax.scipy.linalg.solve_triangular``.
    """
    vec = R.ndim == L.ndim - 1
    if vec:
        R = R[..., None]
    X = (_tri_upper if lower_factor_transposed else _tri_lower)(L, R)
    return X[..., 0] if vec else X
