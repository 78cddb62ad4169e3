"""Dense primal-dual interior-point QP solver (jittable, fixed structure).

Replaces HPIPM's condensed QP solve (ref: src/utils/ocp.py:302).  Solves

    min_z  0.5 z'Pz + q'z    s.t.  C z <= d

with a Mehrotra predictor-corrector method.  Problem sizes after condensing
are small-and-dense (nz ~ 20-600, rows ~ 1e2-1e5): each iteration is one
Cholesky of the (nz, nz) Schur complement P + C'WC plus tall-skinny matmuls
— exactly the shape the MXU wants.  All iterations run under
``lax.while_loop`` with a residual-based exit, so the solver is one fused
XLA computation.

Infinite (absent) bounds are encoded as +/-BIG and behave as inactive rows.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

BIG = 1e8


class QPSolution(NamedTuple):
    z: jnp.ndarray
    lam: jnp.ndarray
    s: jnp.ndarray
    iters: jnp.ndarray
    status: jnp.ndarray       # 0 = converged, 4 = max-iter without tolerance
    gap: jnp.ndarray


def solve_qp(P, q, C, d, tol: float = None, max_iter: int = 50,
             axis_name=None) -> QPSolution:
    """Solve min 0.5 z'Pz + q'z s.t. Cz <= d.

    With ``axis_name`` set (inside shard_map), the constraint rows (C, d)
    are sharded over that mesh axis while (P, q, z) are replicated: every
    row-reduction (Schur complement C'WC, dual residual C'lam, step-length
    ratios, complementarity) goes through a psum/pmin collective, making
    this a distributed IPM whose cross-chip traffic per iteration is one
    (nz, nz) matrix + a few scalars (SURVEY §2.4: the coupling across
    dynamics samples is only through the shared input).

    Args:
        P: (nz, nz) PD Hessian; q: (nz,); C: (m_local, nz); d: (m_local,).
    """
    nz = q.shape[0]
    dtype = q.dtype
    if tol is None:
        tol = 1e-8 if dtype == jnp.float64 else 3e-5
    eye = jnp.eye(nz, dtype=dtype)

    if axis_name is None:
        psum = lambda x: x
        pmin = lambda x: x
        pmax = lambda x: x
        m = d.shape[0]
    else:
        psum = lambda x: jax.lax.psum(x, axis_name)
        pmin = lambda x: jax.lax.pmin(x, axis_name)
        pmax = lambda x: jax.lax.pmax(x, axis_name)
        m = d.shape[0] * jax.lax.psum(1, axis_name)

    z0 = jnp.zeros(nz, dtype)
    s0 = jnp.maximum(d - C @ z0, 1.0)
    # start on the central path (s_i * lam_i = 1 uniformly) so pseudo-infinite
    # rows (slack ~ BIG) carry a near-zero multiplier instead of dragging the
    # barrier parameter up
    lam0 = 1.0 / s0

    def newton(z, lam, s, sigma_mu, ds_dlam_corr):
        w = lam / s
        r_dual = P @ z + q + psum(C.T @ lam)
        r_prim = C @ z + s - d
        r_cent = lam * s - sigma_mu + ds_dlam_corr
        rhs = -r_dual + psum(C.T @ (r_cent / s - w * r_prim))
        M = P + psum((C.T * w) @ C)
        L = jnp.linalg.cholesky(M + 1e-13 * eye)
        dz = jax.scipy.linalg.cho_solve((L, True), rhs)
        ds = -r_prim - C @ dz
        dlam = -(r_cent + lam * ds) / s
        return dz, ds, dlam

    def max_step(v, dv):
        ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
        return jnp.minimum(1.0, 0.99 * pmin(jnp.min(ratio)))

    # scale-aware residuals: the dual residual lives in the units of q
    # (soft-constraint penalties push |q| to ~1e7), the primal in units of z
    qscale = 1.0 + jnp.max(jnp.abs(q))

    def residual(z, lam, s):
        r_dual = jnp.max(jnp.abs(P @ z + q + psum(C.T @ lam))) / qscale
        r_prim = pmax(jnp.max(jnp.abs(C @ z + s - d), initial=0.0))
        return jnp.maximum(jnp.maximum(r_dual, r_prim),
                           psum(jnp.dot(s, lam)) / (m * qscale))

    def body(carry):
        z, lam, s, it, _ = carry
        mu = psum(jnp.dot(s, lam)) / m

        # predictor (affine) step
        dz_a, ds_a, dlam_a = newton(z, lam, s, 0.0, 0.0)
        a_p = max_step(s, ds_a)
        a_d = max_step(lam, dlam_a)
        mu_aff = psum(jnp.dot(s + a_p * ds_a, lam + a_d * dlam_a)) / m
        sigma = jnp.clip((mu_aff / mu) ** 3, 0.0, 1.0)

        # corrector
        dz, ds, dlam = newton(z, lam, s, sigma * mu, dlam_a * ds_a)
        alpha = jnp.minimum(max_step(s, ds), max_step(lam, dlam))
        z_n = z + alpha * dz
        s_n = s + alpha * ds
        lam_n = lam + alpha * dlam

        # freeze the iterate if numerics break down (s -> 0 past convergence);
        # the flag must agree across shards for z to stay replicated
        ok = jnp.all(jnp.isfinite(z_n)) & jnp.all(jnp.isfinite(lam_n)) \
            & jnp.all(jnp.isfinite(s_n))
        ok = pmin(ok.astype(jnp.int32)) > 0
        z = jnp.where(ok, z_n, z)
        s = jnp.where(ok, s_n, s)
        lam = jnp.where(ok, lam_n, lam)
        res = jnp.where(ok, residual(z, lam, s), -jnp.inf)  # -inf => exit
        return z, lam, s, it + 1, res

    def cond(carry):
        _, _, _, it, res = carry
        return (it < max_iter) & (res > tol)

    init = (z0, lam0, s0, jnp.asarray(0), jnp.asarray(jnp.inf, dtype))
    z, lam, s, it, res = jax.lax.while_loop(cond, body, init)
    res = residual(z, lam, s)
    status = jnp.where(res <= jnp.asarray(tol, dtype) * 1e3, 0, 4)
    return QPSolution(z=z, lam=lam, s=s, iters=it, status=status, gap=res)


def boxes_to_rows(Gl, lo, hi):
    """Turn two-sided rows lo <= Gl z <= hi into canonical Cz <= d.

    Rows with |bound| >= BIG are kept (they stay inactive numerically).
    """
    C = jnp.concatenate([Gl, -Gl], axis=0)
    d = jnp.concatenate([hi, -lo], axis=0)
    return C, d
