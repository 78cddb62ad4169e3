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

from sampling_gpmpc_tpu.parallel.collectives import make_reducers
from sampling_gpmpc_tpu.setup import full_precision

BIG = 1e8


def _precond_factor(M, reg, eye):
    """Jacobi-preconditioned Cholesky of a Newton/Schur matrix.

    Load-bearing numerics (CLAUDE.md): the symmetric diagonal scaling
    keeps the f32 factorization alive when penalty-weighted rows push the
    condition number past single range.  Shared by solve_qp and
    solve_qp_soft; the Pallas kernel (`ops/pallas_ipm.py::factorize`)
    carries the in-kernel transliteration of the SAME recipe — change
    both together.
    """
    dmc = jnp.clip(jnp.diagonal(M), 1e-30)
    inv_s = jax.lax.rsqrt(dmc)
    L = jnp.linalg.cholesky(inv_s[:, None] * M * inv_s[None, :] + reg * eye)
    return inv_s, L


def _precond_solve(inv_s, L, rhs):
    """Newton direction against a `_precond_factor` factorization."""
    return inv_s * jax.scipy.linalg.cho_solve((L, True), inv_s * rhs)



# stall exit shared by the XLA loop and the fused Pallas kernel: stop
# after this many iterations without a >=1 % best-KKT improvement (the
# best-iterate tracking makes extra iterations pure waste)
STALL_ITERS = 10
STALL_RTOL = 0.01
# stall counting only applies once complementarity is nearly exhausted
# (the f32 grind regime); hard QPs plateau with high mu and must keep going
MU_GRIND = 1e-6
# solution acceptance: status 0 iff best KKT residual <= STATUS_RTOL * tol
STATUS_RTOL = 1e3
# warm-start per-pair dual band, multiples of mu_ws (see solve_qp_soft's
# warm block).  A pure numerical-sanity safeguard, deliberately NOT a
# re-center: clamping carried duals toward mu_ws/slack was measured to
# DESTROY near-optimal carries.  Active rows sit at slack
# th ≈ tau·(1+|d|) ≈ 1e-4, so a 0.1·mu_ws/th dual floor forced their
# multipliers to ~qscale, and near-degenerate row pairs carry huge
# (~1e8) almost-cancelling duals that any cap breaks — either way the
# IPM started at KKT ~10 with mu ~ 1e-4·mu0, the classic
# small-mu/large-residual stall (self-warm re-solves: 110 iterations vs
# 32 cold; car closed loop: +28 % total iterations warm).  Measured over
# the pendulum1D/car pipelines, bands {(0.1,10), (1e-4,1e4),
# (1e-8,1e12), (0,inf)} gave car totals 3824/2292/1903/1892 warm
# (cold 1810-2976 — within-step SQP carries are affected too): wider is
# strictly better, and (1e-8,1e12) ~ (0,inf) within noise while still
# bounding denormal/garbage pairs away from step-blocking territory.
WS_BAND = (1e-8, 1e12)


class QPSolution(NamedTuple):
    z: jnp.ndarray
    lam: jnp.ndarray
    s: jnp.ndarray
    iters: jnp.ndarray
    status: jnp.ndarray       # 0 = converged, 4 = max-iter without tolerance
    gap: jnp.ndarray
    state: tuple = None       # full primal-dual iterate (unscaled; for warm
    #   starts across SQP/MPC iterations, ref: src/utils/ocp.py:310)




@full_precision
def solve_qp(P, q, C, d, tol: float = None, max_iter: int = 50,
             axis_name=None, ordered: bool = False) -> QPSolution:
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
    reg = 1e-13 if dtype == jnp.float64 else 1e-7
    eye = jnp.eye(nz, dtype=dtype)

    psum, pmin, pmax = make_reducers(axis_name, ordered)
    if axis_name is None:
        m = d.shape[0]
    else:
        m = d.shape[0] * jax.lax.psum(1, axis_name)

    z0 = jnp.zeros(nz, dtype)
    s0 = jnp.maximum(d - C @ z0, 1.0)
    # start on the central path (s_i * lam_i = 1 uniformly) so pseudo-infinite
    # rows (slack ~ BIG) carry a near-zero multiplier instead of dragging the
    # barrier parameter up
    lam0 = 1.0 / s0

    def factorize(z, lam, s):
        """Residuals + assembled/factored Schur complement, shared by the
        predictor and corrector solves of one Mehrotra iteration (identical
        weights => identical matrix; assemble and factor once).  The dual
        residual's and Schur complement's cross-shard sums ride ONE
        tuple-psum (same per-leaf arithmetic, one collective round trip
        instead of two)."""
        w = lam / s
        rd_s, M_s = psum((C.T @ lam, (C.T * w) @ C))
        r_dual = P @ z + q + rd_s
        r_prim = C @ z + s - d
        M = P + M_s
        inv_s, L = _precond_factor(M, reg, eye)
        return {"w": w, "r_dual": r_dual, "r_prim": r_prim,
                "inv_s": inv_s, "L": L}

    def direction(lam, s, aux, sigma_mu, ds_dlam_corr):
        r_cent = lam * s - sigma_mu + ds_dlam_corr
        rhs = -aux["r_dual"] + psum(
            C.T @ (r_cent / s - aux["w"] * aux["r_prim"]))
        dz = _precond_solve(aux["inv_s"], aux["L"], rhs)
        ds = -aux["r_prim"] - C @ dz
        dlam = -(r_cent + lam * ds) / s
        return dz, ds, dlam

    def max_step(v, dv):
        ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
        return jnp.minimum(1.0, 0.99 * pmin(jnp.min(ratio)))

    def max_step2(v1, dv1, v2, dv2):
        """Two step ratios through ONE stacked pmin (elementwise over the
        pair, so each result is bit-identical to its max_step twin)."""
        r1 = jnp.where(dv1 < 0, -v1 / jnp.where(dv1 < 0, dv1, -1.0), jnp.inf)
        r2 = jnp.where(dv2 < 0, -v2 / jnp.where(dv2 < 0, dv2, -1.0), jnp.inf)
        mn = pmin(jnp.stack([jnp.min(r1), jnp.min(r2)]))
        return (jnp.minimum(1.0, 0.99 * mn[0]),
                jnp.minimum(1.0, 0.99 * mn[1]))

    # scale-aware residuals: the dual residual lives in the units of q
    # (soft-constraint penalties push |q| to ~1e7), the primal in units of z
    qscale = 1.0 + jnp.max(jnp.abs(q))

    def residual_parts(z, lam, s):
        """KKT residual with its two cross-shard sums fused into one
        tuple-psum; also returns the complementarity sum so the loop can
        reuse it as the next iteration's mu numerator (it is the same
        psum(dot(s, lam)) on the same state)."""
        rd_s, compl = psum((C.T @ lam, jnp.dot(s, lam)))
        r_dual = jnp.max(jnp.abs(P @ z + q + rd_s)) / qscale
        # relative row residual: far-inactive rows (|d| ~ BIG) have an
        # eps*|d| cancellation floor in the slack identity (see
        # solve_qp_soft's kkt_residual)
        r_prim = pmax(jnp.max(jnp.abs(C @ z + s - d) / (1.0 + jnp.abs(d)),
                              initial=0.0))
        return jnp.maximum(jnp.maximum(r_dual, r_prim),
                           compl / (m * qscale)), compl

    def residual(z, lam, s):
        return residual_parts(z, lam, s)[0]

    def body(carry):
        # csum = psum(dot(s, lam)) of the carried state, computed by the
        # previous iteration's residual_parts (same expression on the same
        # state) — carrying it drops one collective round per iteration
        z, lam, s, it, _, csum = carry
        mu = csum / m
        aux = factorize(z, lam, s)

        # predictor (affine) step
        dz_a, ds_a, dlam_a = direction(lam, s, aux, 0.0, 0.0)
        a_p, a_d = max_step2(s, ds_a, lam, dlam_a)
        mu_aff = psum(jnp.dot(s + a_p * ds_a, lam + a_d * dlam_a)) / m
        sigma = jnp.clip((mu_aff / mu) ** 3, 0.0, 1.0)

        # corrector
        dz, ds, dlam = direction(lam, s, aux, sigma * mu, dlam_a * ds_a)
        a_s, a_l = max_step2(s, ds, lam, dlam)
        alpha = jnp.minimum(a_s, a_l)
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
        res_k, csum = residual_parts(z, lam, s)
        res = jnp.where(ok, res_k, -jnp.inf)  # -inf => exit
        return z, lam, s, it + 1, res, csum

    def cond(carry):
        _, _, _, it, res, _ = carry
        return (it < max_iter) & (res > tol)

    init = (z0, lam0, s0, jnp.asarray(0), jnp.asarray(jnp.inf, dtype),
            psum(jnp.dot(s0, lam0)))
    z, lam, s, it, res, _ = jax.lax.while_loop(cond, body, init)
    res = residual(z, lam, s)
    status = jnp.where(res <= jnp.asarray(tol, dtype) * STATUS_RTOL, 0, 4)
    return QPSolution(z=z, lam=lam, s=s, iters=it, status=status, gap=res)


@full_precision
def solve_qp_soft(H, g, G_h, d_h, G_s, lo_s, hi_s, zl, zu, Zl, Zu,
                  tol: float = None, max_iter: int = 150,
                  axis_name=None, ws: tuple = None,
                  ws_valid=None, ordered: bool = False) -> QPSolution:
    """Structured PDIP with analytic slack elimination (HPIPM-style).

    Solves   min_u  0.5 u'Hu + g'u + sum_j [zl sl + 0.5 Zl sl^2
                                            + zu su + 0.5 Zu su^2]
             s.t.   G_h u <= d_h                       (hard rows)
                    lo_j - sl_j <= G_s u <= hi_j + su_j,  sl, su >= 0

    The slack blocks of the Newton KKT system are diagonal, so each soft
    row folds into a scalar *effective weight* on its u-row and the dense
    solve stays (nU, nU) — the reason HPIPM handles thousands of soft rows
    cheaply (ref: src/utils/ocp.py:205-215,270-287), and what the generic
    formulation (slacks as variables) loses.

    All row quantities are local under ``axis_name``; reductions mirror
    :func:`solve_qp`.

    Warm starting (``ws`` + ``ws_valid``, the HPIPM ``qp_solver_warm_start``
    analog, ref: src/utils/ocp.py:310): ``ws`` is the ``state`` tuple of a
    previous solve with the SAME row structure (consecutive SQP/MPC
    iterations re-linearize the same constraints).  Duals are reused as-is;
    primal slacks are recomputed from the carried primal point against the
    CURRENT bounds; per-pair complementarity is floored at a fraction of
    the warm target so off-center pairs don't block steps.  ``ws_valid``
    is a traced bool selecting warm vs central-path cold start elementwise
    (keeps the jitted structure static across the first iteration).
    """
    nU = g.shape[0]
    dtype = g.dtype
    if tol is None:
        tol = 1e-8 if dtype == jnp.float64 else 3e-5
    reg = 1e-13 if dtype == jnp.float64 else 1e-7

    from sampling_gpmpc_tpu.ops import pallas_ipm
    if axis_name is None and pallas_ipm.fused_ok(
            nU, d_h.shape[0], lo_s.shape[0], dtype):
        # fully fused TPU path: equilibration, warm/cold start assembly,
        # acceptance AND the Mehrotra loop all run in Pallas kernels —
        # same recipes as the XLA body below (equivalence-tested); only
        # padding and the final un-scaling remain XLA ops
        best, best_res, it, scale_h, scale_s = pallas_ipm.run_full(
            H, g, G_h, d_h, G_s, lo_s, hi_s, zl, zu, Zl, Zu,
            ws, ws_valid, tol, reg, max_iter,
            stall_iters=STALL_ITERS, stall_rtol=STALL_RTOL,
            mu_grind=MU_GRIND, ws_band=WS_BAND)
        return _finish(best, best_res, it, scale_h, scale_s, tol, dtype)

    eye = jnp.eye(nU, dtype=dtype)

    # row equilibration: condensed rows span several orders of magnitude
    # (long-horizon Gamma growth); normalize every row to unit inf-norm.
    # Soft-row scaling by a also rescales the slacks (s' = s/a), so the
    # penalties transform as z' = z*a, Z' = Z*a^2 — an equivalent problem.
    scale_h = jnp.maximum(jnp.max(jnp.abs(G_h), axis=1), 1e-10)
    G_h = G_h / scale_h[:, None]
    d_h = d_h / scale_h
    scale_s = jnp.maximum(jnp.max(jnp.abs(G_s), axis=1), 1e-10)
    G_s = G_s / scale_s[:, None]
    lo_s = lo_s / scale_s
    hi_s = hi_s / scale_s
    zl = zl * scale_s
    zu = zu * scale_s
    Zl = Zl * scale_s * scale_s
    Zu = Zu * scale_s * scale_s

    psum, pmin, pmax = make_reducers(axis_name, ordered)
    if axis_name is None:
        m_total = d_h.shape[0] + 4 * lo_s.shape[0]
    else:
        m_total = (d_h.shape[0] + 4 * lo_s.shape[0]) * jax.lax.psum(
            1, axis_name)

    m_s = lo_s.shape[0]
    # qscale feeds mu0, the residual normalization, the best-iterate
    # selection and the exit test — it must agree across shards (zl is
    # scaled by shard-local row norms), or replicated-z breaks and the
    # psum sequences desynchronize
    qscale = 1.0 + jnp.max(jnp.abs(g)) + (jnp.max(zl, initial=0.0)
                                          if m_s else 0.0)
    qscale = pmax(qscale)

    # primal residual rows are measured RELATIVE to their bound magnitude
    # (HPIPM/OSQP-style): far-inactive rows sit at |bound| ~ 1e8-1e12
    # after equilibration, so their slack identities carry an intrinsic
    # eps*|bound| cancellation noise floor (measured ~5e-4 in f64 on car
    # obstacle QPs) that an ABSOLUTE row residual mistakes for
    # non-convergence
    inv_h = 1.0 / (1.0 + jnp.abs(d_h))
    inv_U = 1.0 / (1.0 + jnp.abs(hi_s))
    inv_L = 1.0 / (1.0 + jnp.abs(lo_s))

    def kkt_parts(st):
        """KKT residual with the stationarity and complementarity sums
        fused into ONE tuple-psum (one collective round trip instead of
        two; per-leaf arithmetic unchanged).  Also returns the
        complementarity sum — the loop reuses it as the next iteration's
        mu numerator (identical expression on the identical state)."""
        u, sl, su, th, lh_, tU, lU, tL, lL, nl, nu_ = st
        r1_s, compl = psum((
            G_h.T @ lh_ + G_s.T @ (lU - lL),
            jnp.dot(th, lh_) + jnp.dot(tU, lU) + jnp.dot(tL, lL)
            + jnp.dot(sl, nl) + jnp.dot(su, nu_)))
        r_stat = jnp.max(jnp.abs(H @ u + g + r1_s)) / qscale
        rp = jnp.concatenate([
            (G_h @ u + th - d_h) * inv_h,
            (G_s @ u - su + tU - hi_s) * inv_U,
            (-(G_s @ u) - sl + tL + lo_s) * inv_L,
        ]) if m_s else ((G_h @ u + th - d_h) * inv_h)
        r_prim = pmax(jnp.max(jnp.abs(rp), initial=0.0))
        return jnp.maximum(jnp.maximum(r_stat, r_prim),
                           compl / (m_total * qscale)), compl

    def kkt_residual(st):
        return kkt_parts(st)[0]

    def max_step(pairs):
        a = jnp.asarray(1.0, dtype)
        for v, dv in pairs:
            if v.shape[0] == 0:
                continue
            ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0),
                              jnp.inf)
            a = jnp.minimum(a, jnp.min(ratio, initial=jnp.inf))
        return 0.99 * pmin(a)

    def factorize(st):
        """Per-iteration work shared by predictor and corrector: the barrier
        weights, residuals, and the assembled+factored Schur complement.
        The two Newton solves of a Mehrotra iteration use the SAME matrix
        (same weights), so assembling/factorizing it once halves the
        iteration's dominant cost."""
        u, sl, su, th, lh_, tU, lU, tL, lL, nl, nu_ = st

        w_h = lh_ / th
        rp_h = G_h @ u + th - d_h
        r1_loc = G_h.T @ lh_ + G_s.T @ (lU - lL)
        Mh_loc = (G_h.T * w_h) @ G_h

        # one tuple-psum for the dual residual + both Schur contributions
        # (was three collective rounds; per-leaf arithmetic and the
        # H + Mh + Ms association are unchanged)
        if m_s:
            w_U, w_L = lU / tU, lL / tL
            w_Pl, w_Pu = nl / sl, nu_ / su
            rp_U = G_s @ u - su + tU - hi_s
            rp_L = -(G_s @ u) - sl + tL + lo_s
            r2 = Zl * sl + zl - lL - nl
            r3 = Zu * su + zu - lU - nu_
            Dl = Zl + w_L + w_Pl
            Du = Zu + w_U + w_Pu
            w_eff = w_U + w_L - w_U * w_U / Du - w_L * w_L / Dl
            r1_s, Mh_s, M_s = psum((r1_loc, Mh_loc, (G_s.T * w_eff) @ G_s))
            soft = (w_U, w_L, w_Pl, w_Pu, rp_U, rp_L, r2, r3, Dl, Du)
        else:
            r1_s, Mh_s = psum((r1_loc, Mh_loc))
            M_s = 0.0
            soft = None

        r1 = H @ u + g + r1_s
        M = H + Mh_s + M_s
        inv_s, L = _precond_factor(M, reg, eye)
        return {"w_h": w_h, "rp_h": rp_h, "r1": r1, "soft": soft,
                "inv_s": inv_s, "L": L}

    def direction(st, aux, sig_mu, corr):
        """One Newton solve against the cached factorization."""
        u, sl, su, th, lh_, tU, lU, tL, lL, nl, nu_ = st
        (ch, cU, cL, cPl, cPu) = corr if corr is not None else (0., 0., 0., 0., 0.)
        w_h, rp_h, r1 = aux["w_h"], aux["rp_h"], aux["r1"]

        b_h = (lh_ * th - sig_mu + ch) / th
        # hard and soft rhs contributions ride one tuple-psum (was two
        # rounds); the -r1 + hard - soft association is unchanged
        if m_s:
            (w_U, w_L, w_Pl, w_Pu, rp_U, rp_L, r2, r3, Dl, Du) = aux["soft"]
            b_U = (lU * tU - sig_mu + cU) / tU
            b_L = (lL * tL - sig_mu + cL) / tL
            b_Pl = (nl * sl - sig_mu + cPl) / sl
            b_Pu = (nu_ * su - sig_mu + cPu) / su
            cl = -r2 - b_L - b_Pl + w_L * rp_L
            cu = -r3 - b_U - b_Pu + w_U * rp_U
            const_s = (-b_U + b_L + w_U * rp_U - w_L * rp_L
                       - w_U * cu / Du + w_L * cl / Dl)
            rhs_h, rhs_s = psum((G_h.T @ (b_h - w_h * rp_h),
                                 G_s.T @ const_s))
        else:
            rhs_h = psum(G_h.T @ (b_h - w_h * rp_h))
            rhs_s = 0.0

        rhs = -r1 + rhs_h - rhs_s
        du = _precond_solve(aux["inv_s"], aux["L"], rhs)

        dth = -(G_h @ du) - rp_h
        dlh = -b_h - w_h * dth
        if m_s:
            dsl = (cl - w_L * (G_s @ du)) / Dl
            dsu = (cu + w_U * (G_s @ du)) / Du
            dtU = -(G_s @ du) + dsu - rp_U
            dtL = (G_s @ du) + dsl - rp_L
            dlU = -b_U - w_U * dtU
            dlL = -b_L - w_L * dtL
            dnl = -b_Pl - w_Pl * dsl
            dnu = -b_Pu - w_Pu * dsu
        else:
            z = jnp.zeros((0,), dtype)
            dsl = dsu = dtU = dlU = dtL = dlL = dnl = dnu = z
        return (du, dsl, dsu, dth, dlh, dtU, dlU, dtL, dlL, dnl, dnu)

    # central-path initialization at the problem's dual scale:
    # s * lam = mu0 ~ |g| on every pair (unit complementarity leaves the
    # first iterations fighting a huge dual residual with tiny steps)
    mu0 = qscale
    u0 = jnp.zeros(nU, dtype)
    th0 = jnp.maximum(d_h, 1.0)
    one_s = jnp.ones((m_s,), dtype)
    tU0 = jnp.maximum(hi_s - 0.0 + 1.0, 1.0) if m_s else one_s[:0]
    tL0 = jnp.maximum(-lo_s + 1.0, 1.0) if m_s else one_s[:0]
    st0 = (u0, one_s, one_s, th0, mu0 / th0, tU0, mu0 / tU0, tL0, mu0 / tL0,
           mu0 * one_s, mu0 * one_s)

    if ws is not None:
        # Duals-only warm start: carry the multipliers (and soft-slack
        # magnitudes), restart the primal at u=0 like the cold start.
        # Carrying the previous primal point was measured consistently
        # WORSE than cold on MPC transients (blocked steps off tight
        # slacks); duals-only beats cold everywhere.  Carried (unscaled)
        # quantities map into this call's row scaling as λ' = a·λ,
        # slack' = slack/a (complementarity invariant).
        (u_w, sl_w, su_w, _, lh_w, _, lU_w, _, lL_w, nl_w, nu_w) = ws
        lh_w = lh_w * scale_h
        sl_w, su_w = sl_w / scale_s, su_w / scale_s
        lU_w, lL_w = lU_w * scale_s, lL_w * scale_s
        nl_w, nu_w = nl_w * scale_s, nu_w * scale_s
        # Warm complementarity target scaled to the warm point's quality:
        # a stale point (large dual residual) must start near the cold
        # mu0 — pairing small mu with a big residual stalls the IPM in
        # tiny centrality-limited steps (measured: 100+ iterations on MPC
        # transients).  Near-optimal carries (steady state) get the small
        # target and converge in ~3 iterations.
        # staleness = stationarity residual of the carried PAIR (u_w, λ_w)
        # under the CURRENT data; u_w itself is not used as the start point
        r_w = H @ u_w + g + psum(G_h.T @ lh_w + (G_s.T @ (lU_w - lL_w)
                                                 if m_s else 0.0))
        rq = pmax(jnp.max(jnp.abs(r_w))) / qscale
        tau = jnp.clip(rq, 1e-4, 1.0)
        mu_ws = mu0 * tau
        # Per-pair complementarity band around primal-feasible slacks at
        # u=0 (multiples of mu_ws; see WS_BAND above).
        floor, cap = WS_BAND[0] * mu_ws, WS_BAND[1] * mu_ws
        tau_h = tau * (1.0 + jnp.abs(d_h))
        th_w = jnp.maximum(d_h, tau_h)
        lh_w = jnp.clip(lh_w, floor / th_w, cap / th_w)
        if m_s:
            sl_w = jnp.maximum(sl_w, tau)
            su_w = jnp.maximum(su_w, tau)
            tU_w = jnp.maximum(hi_s + su_w, tau * (1.0 + jnp.abs(hi_s)))
            tL_w = jnp.maximum(-lo_s + sl_w, tau * (1.0 + jnp.abs(lo_s)))
            lU_w = jnp.clip(lU_w, floor / tU_w, cap / tU_w)
            lL_w = jnp.clip(lL_w, floor / tL_w, cap / tL_w)
            nl_w = jnp.clip(nl_w, floor / sl_w, cap / sl_w)
            nu_w = jnp.clip(nu_w, floor / su_w, cap / su_w)
        else:
            sl_w = su_w = tU_w = lU_w = tL_w = lL_w = nl_w = nu_w = one_s[:0]
        st_w = (u0, sl_w, su_w, th_w, lh_w, tU_w, lU_w, tL_w, lL_w,
                nl_w, nu_w)
        # accept the carry only when (a) the carried pair is close to
        # optimal for THIS problem (steady-state MPC; stale carries
        # measured 3x worse than cold on transients) and (b) the assembled
        # warm point does not start at a worse KKT residual than the cold
        # central-path point — a cheap guarantee against adversarial
        # carries (one extra residual evaluation)
        valid = (jnp.asarray(True) if ws_valid is None else ws_valid)
        valid = valid & (rq < 1e-2)
        valid = valid & (kkt_residual(st_w) <= kkt_residual(st0))
        st0 = jax.tree_util.tree_map(
            lambda w, c: jnp.where(valid, w, c), st_w, st0)

    def compl_sum(st):
        _, sl, su, th, lh_, tU, lU, tL, lL, nl, nu_ = st
        return psum(jnp.dot(th, lh_) + jnp.dot(tU, lU) + jnp.dot(tL, lL)
                    + jnp.dot(sl, nl) + jnp.dot(su, nu_))

    def add(st, d, a):
        return tuple(v + a * dv for v, dv in zip(st, d))

    def pairs(st, d):
        # every (nonneg variable, its delta) pair that limits the step
        idx = [(1, 1), (2, 2), (3, 3), (4, 4), (5, 5), (6, 6), (7, 7), (8, 8),
               (9, 9), (10, 10)]
        return [(st[i], d[j]) for i, j in idx]

    def body(carry):
        # csum = compl_sum(st) of the carried state, produced by the
        # previous iteration's kkt_parts (identical expression on the
        # identical state) — carrying it saves two collective rounds per
        # iteration (the old mu and mu_new recomputations)
        st, best, best_res, it, _, since, csum = carry
        mu = csum / m_total
        aux = factorize(st)
        d_aff = direction(st, aux, 0.0, None)
        a_aff = max_step(pairs(st, d_aff))
        st_aff = add(st, d_aff, a_aff)
        mu_aff = compl_sum(st_aff) / m_total
        sigma = jnp.clip((mu_aff / mu) ** 3, 0.0, 1.0)
        # corr order: (h, U, L, Pl, Pu) = (dlh*dth, dlU*dtU, dlL*dtL,
        #              dnl*dsl, dnu*dsu)
        corr = (d_aff[4] * d_aff[3], d_aff[6] * d_aff[5], d_aff[8] * d_aff[7],
                d_aff[9] * d_aff[1], d_aff[10] * d_aff[2])
        d = direction(st, aux, sigma * mu, corr)
        alpha = max_step(pairs(st, d))
        st_n = add(st, d, alpha)
        ok = jnp.asarray(True)
        for v in st_n:
            ok = ok & jnp.all(jnp.isfinite(v))
        ok = pmin(ok.astype(jnp.int32)) > 0
        st = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), st_n, st)
        res_k, csum = kkt_parts(st)
        res = jnp.where(ok, res_k, jnp.inf)
        # keep the best-residual iterate: late iterations with exhausted
        # complementarity can degrade the dual residual numerically
        improved = res < best_res
        best = jax.tree_util.tree_map(
            lambda new, old: jnp.where(improved, new, old), st, best)
        # f32-only stall exit: near the f32 KKT floor the exact stop
        # (res<=tol or mu collapse) is a knife-edge — measured 139 vs 34
        # iterations for two bit-close trajectories of the same hard QP.
        # Count iterations without MEANINGFUL (1 %) best-residual
        # improvement instead — but ONLY in the grind regime where
        # complementarity is nearly exhausted (mu below MU_GRIND * mu0):
        # hard active-set changes legitimately plateau the residual for
        # tens of iterations while mu is still high (measured: a car
        # obstacle QP stalls-then-converges at iteration 55 in f32, 71 in
        # f64 — the old unconditional counter aborted it at 11 with
        # gap 1.4).  f64 keeps the exact semantics: the golden closed
        # loops pin full-accuracy solves, and the f64 path never grinds
        # at a numerical floor.
        meaningful = res < best_res * (1.0 - STALL_RTOL)
        best_res = jnp.minimum(res, best_res)
        mu_new = csum / m_total
        grinding = mu_new < MU_GRIND * mu0
        since = jnp.where(meaningful | ~grinding, 0, since + 1)
        live = ok & (mu_new > 1e-14 * mu0)
        if dtype != jnp.float64:
            live = live & (since < STALL_ITERS)
        res_flag = jnp.where(live, best_res, -jnp.inf)   # -inf => exit
        return st, best, best_res, it + 1, res_flag, since, csum

    def cond(carry):
        _, _, _, it, res, _, _ = carry
        return (it < max_iter) & (res > tol)

    _, best, best_res, it, _, _, _ = jax.lax.while_loop(
        cond, body, (st0, st0, jnp.asarray(jnp.inf, dtype),
                     jnp.asarray(0), jnp.asarray(jnp.inf, dtype),
                     jnp.asarray(0), compl_sum(st0)))
    return _finish(best, best_res, it, scale_h, scale_s, tol, dtype)


def _finish(best, best_res, it, scale_h, scale_s, tol, dtype):
    """Status + un-equilibration tail shared by the XLA and fused paths."""
    status = jnp.where(best_res <= jnp.asarray(tol, dtype) * STATUS_RTOL,
                       0, 4)
    # undo the row equilibration so the carried state is scale-independent
    (u_b, sl_b, su_b, th_b, lh_b, tU_b, lU_b, tL_b, lL_b, nl_b, nu_b) = best
    state = (u_b, sl_b * scale_s, su_b * scale_s, th_b * scale_h,
             lh_b / scale_h, tU_b * scale_s, lU_b / scale_s,
             tL_b * scale_s, lL_b / scale_s, nl_b / scale_s,
             nu_b / scale_s)
    return QPSolution(z=best[0], lam=best[4], s=best[3], iters=it,
                      status=status, gap=best_res, state=state)


def boxes_to_rows(Gl, lo, hi):
    """Turn two-sided rows lo <= Gl z <= hi into canonical Cz <= d.

    Rows with |bound| >= BIG are kept (they stay inactive numerically).
    """
    C = jnp.concatenate([Gl, -Gl], axis=0)
    d = jnp.concatenate([hi, -lo], axis=0)
    return C, d
