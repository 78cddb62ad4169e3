"""Per-sample condensing of affine-dynamics trajectories onto the input.

The augmented OCP couples the ns sampled dynamics only through the shared
input (ref: src/utils/model.py:10-41).  Rather than forming the reference's
dense (nx*ns*H) QP (HPIPM full condensing), we condense each sample onto
dU = (du_0..du_{H-1}) independently — batched over samples with vmap —
and reduce only the small input-space quantities across samples (psum on a
mesh).  For delta-dynamics

    dx_{k+1} = A_k dx_k + B_k du_k + r_k,     dx_0 fixed,

the affine map is  dx_k = T_k + Gamma_k dU  with

    T_0 = dx_0,            T_{k+1} = A_k T_k + r_k
    Gamma_0 = 0,           Gamma_{k+1} = A_k Gamma_k + B_k e_k^T .
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def condense_single(A, B, r, dx0):
    """Condense one sample's trajectory.

    Args:
        A: (H, nx, nx); B: (H, nx, nu); r: (H, nx); dx0: (nx,)
    Returns:
        T: (H+1, nx); Gamma: (H+1, nx, H*nu)
    """
    H, nx, nu = B.shape
    G0 = jnp.zeros((nx, H * nu), A.dtype)

    def step(carry, inp):
        T_k, G_k = carry
        A_k, B_k, r_k, k = inp
        T_n = A_k @ T_k + r_k
        G_n = A_k @ G_k
        G_n = jax.lax.dynamic_update_slice(
            G_n, G_n[:, :nu] * 0 + B_k, (0, k * nu))
        # add B_k into column block k (block was zero before this stage)
        return (T_n, G_n), (T_n, G_n)

    ks = jnp.arange(H)
    (_, _), (T_tail, G_tail) = jax.lax.scan(step, (dx0, G0), (A, B, r, ks))
    T = jnp.concatenate([dx0[None], T_tail], axis=0)
    Gamma = jnp.concatenate([G0[None], G_tail], axis=0)
    return T, Gamma


def _small_mm(A, X):
    """``(..., n, n) @ (..., n, m)`` for tiny static n, unrolled.

    Batched (2, 2)/(4, 4) matmuls map terribly onto the 128x128 MXU
    (<= a few % utilization plus per-op padding/dispatch), and the
    condensing compose tree is made of nothing else.  Unrolling the tiny
    contraction turns each product into n^2 broadcast multiply-adds over
    the big trailing axis — pure VPU work XLA fuses into a few loops.
    Measured at the bench shape: the condensing stage drops from the
    dominant assembly cost to noise (BENCH_NOTES round 4).
    """
    n = A.shape[-2]
    rows = []
    for i in range(n):
        acc = A[..., i, 0, None] * X[..., 0, :]
        for j in range(1, A.shape[-1]):
            acc = acc + A[..., i, j, None] * X[..., j, :]
        rows.append(acc)
    return jnp.stack(rows, axis=-2)


def condense_single_parallel(A, B, r, dx0):
    """Associative-scan condensing: O(log H) depth instead of O(H).

    The horizon is this problem's sequence axis (SURVEY §2.4): the affine
    stage maps  m_k : (T, Gamma) -> (A_k T + r_k, A_k Gamma + B_k e_k')
    compose associatively, so the prefix products over stages parallelize
    with ``lax.associative_scan`` — the condensing analog of parallel-prefix
    Riccati.  Work grows by ~log H but the critical path collapses, which
    is what the TPU wants for long horizons (H up to 100 in the car
    configs).

    Same contract as :func:`condense_single`.
    """
    H, nx, nu = B.shape
    nU = H * nu
    dtype = A.dtype
    # f32 (the TPU production path): unrolled small matmuls (see
    # _small_mm).  f64 keeps dot_general so the committed goldens stay
    # bitwise-stable (the unroll fixes a different fp summation order).
    mm = _small_mm if dtype == jnp.float32 else (
        lambda a, x: jnp.einsum("...ij,...jk->...ik", a, x))

    # stage map as (A_k, C_k) acting on the stacked (nx, nU+1) carry
    # [Gamma | T]:  carry' = A_k carry + C_k
    C = jnp.zeros((H, nx, nU + 1), dtype)
    C = C.at[:, :, nU].set(r)
    stage_ids = jnp.arange(H)
    C = jax.vmap(
        lambda Ck, Bk, k: jax.lax.dynamic_update_slice(Ck, Bk, (0, k * nu))
    )(C, B, stage_ids)

    def compose(left, right):
        # apply left (earlier) then right (later): x -> A_r (A_l x + C_l) + C_r
        A_l, C_l = left
        A_r, C_r = right
        return (mm(A_r, A_l), mm(A_r, C_l) + C_r)

    A_pref, C_pref = jax.lax.associative_scan(compose, (A, C), axis=0)
    carry0 = jnp.concatenate(
        [jnp.zeros((nx, nU), dtype), dx0[:, None]], axis=1)
    tail = mm(A_pref, carry0[None]) + C_pref       # (H, nx, nU+1)
    full = jnp.concatenate([carry0[None], tail], axis=0)
    return full[:, :, nU], full[:, :, :nU]


condense = jax.vmap(condense_single)           # over the sample axis
condense_parallel = jax.vmap(condense_single_parallel)
