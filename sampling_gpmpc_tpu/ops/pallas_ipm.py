"""Fused Mehrotra predictor-corrector IPM as one Pallas TPU kernel.

Replaces the ``lax.while_loop`` at the heart of ``ocp.qp.solve_qp_soft``
(the HPIPM-analog structured QP, ref: src/utils/ocp.py:302) for the
single-device f32 path.  The XLA while_loop pays per-HLO dispatch for
every one of the ~30 Mehrotra iterations — measured ~2.4 ms of the
4.5 ms SQP-RTI step at the bench shape (nU=20, m_h=7720, m_s=64;
BENCH_NOTES "GP-stage profiling") even though the arithmetic is trivial
(one 618 KB constraint matrix, a (20,20) Schur factorization).  Here the
ENTIRE iteration loop runs inside VMEM-resident kernel invocations:
problem data and primal-dual state never leave VMEM within a chunk, and
each iteration is pure VPU/MXU work.

Early exit needs care: on the TPU scalar pipeline BOTH ``pl.when`` and
in-kernel ``lax.while_loop`` bodies cost their static trip bound — a
loop that exits after 9 of 150 trips still pays for 150 (measured:
0.73 ms vs 0.085 ms for the identical 9 active iterations at bounds
150/30; a minimal dot-per-trip kernel reproduces it).  So the kernel
runs a fixed CHUNK of iterations and an XLA-level ``lax.while_loop``
re-invokes it from the CURRENT state until converged/dead/out of
budget; typical warm QPs (<= ~12 iterations) cost one invocation.

Layout choices (TPU tiling is (8 sublanes, 128 lanes) for f32):

- Constraint matrices are stored TRANSPOSED, ``G_t (nU_p, m_p)``: both
  matvec directions and the Schur complement ``(G' diag(w)) G`` become
  single ``dot_general`` contractions over the lane axis — no in-kernel
  transposes anywhere (the Jacobi scaling exploits the Schur
  complement's symmetry to get the row/column diagonals without one).
- Every m-sized quantity is a ``(1, m_p)`` lane row; the 11-tuple IPM
  state packs into three refs — ``u (1, nU_p)``, ``hard (2, m_hp)`` =
  [slack, dual], ``soft (8, m_sp)`` = [tU, tL, sl, su | lU, lL, nl, nu]
  — so step-ratio / complementarity / finiteness sweeps are whole-array
  VPU ops and the pairing (row i with row i+4) is a single slice-product.
- Padding rows carry (slack=1, dual=0, d=1, zero G columns) and deltas
  are masked, making pads exactly invisible to complementarity sums,
  residual maxima and step-length ratios.

A second ``prepare`` kernel fuses everything AROUND the loop too: row
equilibration, the central-path cold start, the duals-only warm-start
assembly and its two-KKT acceptance test (ocp/qp.py's pre-loop block).
Measured on the bench shape, that pre-loop was ~0.45 ms of XLA dispatch
(~60 small row ops) against ~0.6 ms for the whole 32-iteration fused
loop — fusing it matters as much as fusing the loop did.  Only padding
(host-side layout) and the final un-scaling stay in XLA.  The XLA
while_loop stays as the reference implementation for CPU / f64 /
sharded (``axis_name``) / oversized problems, and the two paths are
equivalence-tested (tests/test_pallas_ipm.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sampling_gpmpc_tpu.ops.batch_linalg import _device_platform

# tracing the fused kernels under an already-deep jit stack (e.g. a
# caller-side wrapper around sqp_iteration) can exceed CPython's default
# 1000-frame recursion limit inside jax's tracing utilities
import sys as _sys

_sys.setrecursionlimit(max(_sys.getrecursionlimit(), 20000))

LANES = 128
_INTERPRET = False          # flipped by tests to run kernels off-TPU
_HIGH = jax.lax.Precision.HIGHEST
VMEM_BUDGET = 24 * 1024 * 1024   # v5e has 128 MB VMEM/core; leave headroom
# the default scoped-vmem limit is 16 MB — raise it so VMEM_BUDGET-sized
# problems actually compile (measured: ns=512 bench row OOMed at 24.3 MB
# against the 16 MB default)
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
# kernel iterations per invocation: every trip costs its static time
# whether live or predicated off, so size chunks for the warm-start
# common case and let the outer while_loop re-invoke.  Steady-state MPC
# QPs converge in ~1 Mehrotra iteration (delta-form SQP at the shifted
# solution), so small chunks win there: slope-measured closed loop
# 0.261 ms/step at 4 vs 0.313 at 16 vs 0.306 at 2, while a 37-iteration
# cold solve pays only ~1.5 % more invocation overhead at 4.
# (SGPMPC_IPM_CHUNK overrides for experiments)
CHUNK = int(os.environ.get("SGPMPC_IPM_CHUNK", "4"))


def fused_ok(nU: int, m_h: int, m_s: int, dtype) -> bool:
    """Static gate: can this problem run in the fused kernel?"""
    if os.environ.get("SGPMPC_NO_PALLAS") or os.environ.get("SGPMPC_NO_FUSED_IPM"):
        return False
    if dtype != jnp.float32 or m_s < 1 or not (1 <= nU <= 128):
        return False
    nU_p = max(8, -(-nU // 8) * 8)
    m_hp = -(-m_h // LANES) * LANES
    m_sp = -(-m_s // LANES) * LANES
    # G_t + ~16 hard-row vectors + ~40 soft rows + small matrices
    vmem = 4 * (nU_p * (m_hp + m_sp) + 16 * m_hp + 40 * m_sp
                + 3 * nU_p * nU_p + 16 * nU_p)
    if vmem > VMEM_BUDGET:
        return False
    if _INTERPRET:
        return True
    return _device_platform() in ("tpu", "axon")


def _pad_lanes(x, n, fill=0.0):
    return jnp.pad(x, ((0, 0), (0, n - x.shape[1])), constant_values=fill)


def _kernel(Hp, gp, Gth, dh, mh, Gts, sd, ms, u0, h0, s0, qs,
            # outputs: current state (chunk exit), chunk-best state,
            # chunk-best residual, iterations executed, stop flag
            cu, ch, cs, bu, bh, bs, bres, bit, bstop, bsince,
            # scratch
            dAu, dAh, dAs, dCu, dCh, dCs,
            Lr, wh, rph, sx, r1r, sst,
            *, nU: int, m_total: int, tol: float, reg: float,
            max_iter: int, stall_iters: int, stall_rtol: float,
            mu_grind: float):
    """One grid program: a CHUNK of ``max_iter`` Mehrotra iterations.

    Ref rows: sd = [lo, hi, zl, zu, Zl, Zu, wU, wL] (wU/wL the relative
    primal-residual weights mask/(1+|bound|)); dh = [d_h, w_h];
    soft state rows = [tU, tL, sl, su, lU, lL, nl, nu];
    sx (factorize aux) rows = [w_U, w_L, w_Pl, w_Pu, rp_U, rp_L, r2, r3,
    Dl, Du]; hard state rows = [th, lh].
    """
    f32 = jnp.float32
    nU_p = Hp.shape[0]
    qscale = qs[0, 0]
    # remaining GLOBAL iteration budget (exact max_iter cap across chunks,
    # matching the XLA twin's hard stop; trips beyond it are predicated
    # dead — they cost their static time either way, module docstring)
    budget = qs[0, 1].astype(jnp.int32)
    # stall counter and global best residual are CARRIED ACROSS CHUNKS via
    # qs so the stall semantics exactly match the XLA twin's single loop
    since0 = qs[0, 2].astype(jnp.int32)
    gbest = qs[0, 3]
    mu0 = qscale

    rows_n = jax.lax.broadcasted_iota(jnp.int32, (nU_p, nU_p), 0)
    cols_n = jax.lax.broadcasted_iota(jnp.int32, (nU_p, nU_p), 1)
    lane_n = jax.lax.broadcasted_iota(jnp.int32, (1, nU_p), 1)
    eye_m = jnp.where(rows_n == cols_n, 1.0, 0.0).astype(f32)

    def dotg(a, b, ca, cb):
        return jax.lax.dot_general(
            a, b, (((ca,), (cb,)), ((), ())),
            preferred_element_type=f32, precision=_HIGH)

    # matvecs against the transposed-stored constraint matrices
    def Gh_u(u):                     # (1,nU_p) -> (1,m_hp)
        return dotg(u, Gth[...], 1, 0)

    def GhT_v(v):                    # (1,m_hp) -> (1,nU_p)
        return dotg(v, Gth[...], 1, 1)

    def Gs_u(u):
        return dotg(u, Gts[...], 1, 0)

    def GsT_v(v):
        return dotg(v, Gts[...], 1, 1)

    def Hu(u):                       # symmetric H
        return dotg(u, Hp[...], 1, 0)

    def compl(h, s):
        return (jnp.sum(h[0:1] * h[1:2])
                + jnp.sum(s[0:4] * s[4:8]))

    def stationarity(u, h, s):
        return (Hu(u) + gp[...] + GhT_v(h[1:2])
                + GsT_v(s[4:5] - s[5:6]))

    def kkt(u, h, s):
        # primal rows weighted RELATIVE to bound magnitude (rows 1 of dh /
        # 6-7 of sd carry mask/(1+|bound|)), mirroring the XLA twin: far
        # rows have an eps*|bound| cancellation floor in their slack
        # identity that an absolute residual mistakes for non-convergence
        r1 = stationarity(u, h, s)
        r_stat = jnp.max(jnp.abs(r1)) / qscale
        gu = Gh_u(u)
        rp_h = jnp.abs(gu + h[0:1] - dh[0:1]) * dh[1:2]
        gsu = Gs_u(u)
        rp_U = gsu - s[3:4] + s[0:1] - sd[1:2]
        rp_L = -gsu - s[2:3] + s[1:2] + sd[0:1]
        rp_s = jnp.maximum(jnp.abs(rp_U) * sd[6:7], jnp.abs(rp_L) * sd[7:8])
        r_prim = jnp.maximum(jnp.max(rp_h), jnp.max(rp_s))
        c = compl(h, s) / (m_total * qscale)
        return jnp.maximum(jnp.maximum(r_stat, r_prim), c)

    # dynamic indexing is legal on the SUBLANE dim (row reads) but not the
    # lane dim, so pivots / columns are masked lane reductions and the
    # column deposit is a full-matrix masked write

    def cho_factor(M):
        """Right-looking Cholesky on the (nU_p, nU_p) scratch ``Lr``."""
        Lr[...] = M

        def step(j, _):
            rowj = Lr[pl.ds(j, 1), :]                       # (1, nU_p)
            piv = jnp.sum(jnp.where(lane_n == j, rowj, 0.0))
            r = jax.lax.rsqrt(piv)
            # active block stays symmetric => column j == row j's values
            colj = jnp.sum(jnp.where(cols_n == j, Lr[...], 0.0),
                           axis=1, keepdims=True)           # (nU_p, 1)
            lj = jnp.where(rows_n[:, :1] >= j, colj * r, 0.0)
            f1 = jnp.where(rows_n[:, :1] > j, colj * r, 0.0)
            f2 = jnp.where(cols_n[:1, :] > j, rowj * r, 0.0)
            Lr[...] = jnp.where(cols_n == j, lj, Lr[...] - f1 * f2)
            return 0

        # Mosaic's dynamic-loop codegen for these row-at-a-time triangular
        # sweeps is ~8x slower than straight-line code (measured 0.70 ms vs
        # 0.15 ms per solve at nU=20, m_h=7720); nU is small and static, so
        # unroll fully.  The OUTER Mehrotra loop must stay dynamic — fully
        # unrolling it costs 70+ s of Mosaic compile time and runs slower.
        jax.lax.fori_loop(0, nU, step, 0, unroll=True)
        Lr[...] = jnp.where(rows_n >= cols_n, Lr[...], 0.0)

    def cho_solve(b):
        """L L' x = b for one (1, nU_p) row, row-oriented substitutions."""
        def fwd(j, y):
            lrow = Lr[pl.ds(j, 1), :]
            acc = jnp.sum(jnp.where(lane_n < j, lrow * y, 0.0))
            piv = jnp.sum(jnp.where(lane_n == j, lrow, 0.0))
            bj = jnp.sum(jnp.where(lane_n == j, y, 0.0))
            yj = (bj - acc) / piv
            return jnp.where(lane_n == j, yj, y)

        y = jax.lax.fori_loop(0, nU, fwd, b, unroll=True)

        def bwd(i, x):
            j = nU - 1 - i
            lrow = Lr[pl.ds(j, 1), :]          # row j of L = col j of L'
            piv = jnp.sum(jnp.where(lane_n == j, lrow, 0.0))
            xj = jnp.sum(jnp.where(lane_n == j, x, 0.0)) / piv
            # eliminate x_j from remaining rows k<j: b_k -= L[j,k] x_j
            x = x - jnp.where(lane_n < j, lrow * xj, 0.0)
            return jnp.where(lane_n == j, xj, x)

        return jax.lax.fori_loop(0, nU, bwd, y, unroll=True)

    def factorize():
        """Residuals + Schur assembly + factorization of the CURRENT state,
        shared by the predictor and corrector solves (same weights =>
        same matrix; ref XLA twin: ocp/qp.py::solve_qp_soft.factorize).
        The Jacobi scaling transliterates ocp/qp.py::_precond_factor —
        the two recipes must change together (load-bearing numerics)."""
        u, h, s = cu[...], ch[...], cs[...]
        th, lh = h[0:1], h[1:2]
        tU, tL, sl, su = s[0:1], s[1:2], s[2:3], s[3:4]
        lU, lL, nl, nu_ = s[4:5], s[5:6], s[6:7], s[7:8]
        lo, hi, zl, zu, Zl, Zu = (sd[0:1], sd[1:2], sd[2:3], sd[3:4],
                                  sd[4:5], sd[5:6])

        w_h = lh / th
        wh[...] = w_h
        rph[...] = Gh_u(u) + th - dh[0:1]
        r1r[...] = stationarity(u, h, s)

        w_U, w_L = lU / tU, lL / tL
        w_Pl, w_Pu = nl / sl, nu_ / su
        gsu = Gs_u(u)
        sx[4:5, :] = gsu - su + tU - hi          # rp_U
        sx[5:6, :] = -gsu - sl + tL + lo         # rp_L
        sx[6:7, :] = Zl * sl + zl - lL - nl      # r2
        sx[7:8, :] = Zu * su + zu - lU - nu_     # r3
        Dl = Zl + w_L + w_Pl
        Du = Zu + w_U + w_Pu
        sx[0:1, :] = w_U
        sx[1:2, :] = w_L
        sx[2:3, :] = w_Pl
        sx[3:4, :] = w_Pu
        sx[8:9, :] = Dl
        sx[9:10, :] = Du

        w_eff = w_U + w_L - w_U * w_U / Du - w_L * w_L / Dl
        M = (Hp[...] + dotg(Gth[...] * w_h, Gth[...], 1, 1)
             + dotg(Gts[...] * w_eff, Gts[...], 1, 1))
        # Jacobi scaling; M is symmetric so the row- and column-diagonal
        # vectors come from the same masked reductions (no transpose)
        Me = M * eye_m
        d_row = jnp.clip(jnp.sum(Me, axis=0, keepdims=True), 1e-30)
        d_col = jnp.clip(jnp.sum(Me, axis=1, keepdims=True), 1e-30)
        inv_r = jax.lax.rsqrt(d_row)
        inv_c = jax.lax.rsqrt(d_col)
        cho_factor(inv_c * M * inv_r + reg * eye_m)
        return inv_r

    def direction(inv_r, sig_mu, du_ref, dh_ref, ds_ref, corr):
        """One Newton solve against the cached factorization; ``corr``
        is None for the predictor, else (ch_, cU, cL, cPl, cPu) rows."""
        u, h, s = cu[...], ch[...], cs[...]
        th, lh = h[0:1], h[1:2]
        tU, tL, sl, su = s[0:1], s[1:2], s[2:3], s[3:4]
        lU, lL, nl, nu_ = s[4:5], s[5:6], s[6:7], s[7:8]
        w_U, w_L, w_Pl, w_Pu = sx[0:1], sx[1:2], sx[2:3], sx[3:4]
        rp_U, rp_L, r2, r3 = sx[4:5], sx[5:6], sx[6:7], sx[7:8]
        Dl, Du = sx[8:9], sx[9:10]
        w_h, rp_h = wh[...], rph[...]

        if corr is None:
            ch_ = cU = cL = cPl = cPu = 0.0
        else:
            ch_, cU, cL, cPl, cPu = corr

        b_h = (lh * th - sig_mu + ch_) / th
        b_U = (lU * tU - sig_mu + cU) / tU
        b_L = (lL * tL - sig_mu + cL) / tL
        b_Pl = (nl * sl - sig_mu + cPl) / sl
        b_Pu = (nu_ * su - sig_mu + cPu) / su
        cl = -r2 - b_L - b_Pl + w_L * rp_L
        cu_ = -r3 - b_U - b_Pu + w_U * rp_U
        const_s = (-b_U + b_L + w_U * rp_U - w_L * rp_L
                   - w_U * cu_ / Du + w_L * cl / Dl)

        rhs = -r1r[...] + GhT_v(b_h - w_h * rp_h) - GsT_v(const_s)
        du = inv_r * cho_solve(inv_r * rhs)
        du_ref[...] = du

        dth = -Gh_u(du) - rp_h
        dlh = -b_h - w_h * dth
        dh_ref[0:1, :] = dth * mh[...]
        dh_ref[1:2, :] = dlh * mh[...]

        gsdu = Gs_u(du)
        dsl = (cl - w_L * gsdu) / Dl
        dsu = (cu_ + w_U * gsdu) / Du
        dtU = -gsdu + dsu - rp_U
        dtL = gsdu + dsl - rp_L
        ds_ref[0:1, :] = dtU * ms[...]
        ds_ref[1:2, :] = dtL * ms[...]
        ds_ref[2:3, :] = dsl * ms[...]
        ds_ref[3:4, :] = dsu * ms[...]
        ds_ref[4:5, :] = (-b_U - w_U * dtU) * ms[...]
        ds_ref[5:6, :] = (-b_L - w_L * dtL) * ms[...]
        ds_ref[6:7, :] = (-b_Pl - w_Pl * dsl) * ms[...]
        ds_ref[7:8, :] = (-b_Pu - w_Pu * dsu) * ms[...]

    def max_step(dh_ref, ds_ref):
        h, s = ch[...], cs[...]
        dh_, ds_ = dh_ref[...], ds_ref[...]
        rh = jnp.where(dh_ < 0, -h / jnp.where(dh_ < 0, dh_, -1.0), jnp.inf)
        rs = jnp.where(ds_ < 0, -s / jnp.where(ds_ < 0, ds_, -1.0), jnp.inf)
        return 0.99 * jnp.minimum(
            1.0, jnp.minimum(jnp.min(rh), jnp.min(rs)))

    # ---- init ------------------------------------------------------------
    cu[...] = u0[...]
    ch[...] = h0[...]
    cs[...] = s0[...]
    bu[...] = u0[...]
    bh[...] = h0[...]
    bs[...] = s0[...]
    sst[0] = gbest                 # best-so-far residual (global, carried)

    # the loop bound is the CHUNK size; every trip costs whether live or
    # predicated off (module docstring), so the bound is kept small and
    # the XLA caller re-invokes for hard problems
    def cond(c):
        it, stop, _ = c
        return (it < max_iter) & (it < budget) & (stop == 0)

    def body(c):
        it, _, since = c
        mu = compl(ch[...], cs[...]) / m_total
        inv_r = factorize()
        direction(inv_r, 0.0, dAu, dAh, dAs, None)
        a_aff = max_step(dAh, dAs)
        h_aff = ch[...] + a_aff * dAh[...]
        s_aff = cs[...] + a_aff * dAs[...]
        mu_aff = compl(h_aff, s_aff) / m_total
        sigma = jnp.clip((mu_aff / mu) ** 3, 0.0, 1.0)
        corr = (dAh[1:2] * dAh[0:1], dAs[4:5] * dAs[0:1],
                dAs[5:6] * dAs[1:2], dAs[6:7] * dAs[2:3],
                dAs[7:8] * dAs[3:4])
        direction(inv_r, sigma * mu, dCu, dCh, dCs, corr)
        alpha = max_step(dCh, dCs)

        u_n = cu[...] + alpha * dCu[...]
        h_n = ch[...] + alpha * dCh[...]
        s_n = cs[...] + alpha * dCs[...]
        ok = (jnp.all(jnp.isfinite(u_n)) & jnp.all(jnp.isfinite(h_n))
              & jnp.all(jnp.isfinite(s_n)))

        @pl.when(ok)
        def _():
            cu[...] = u_n
            ch[...] = h_n
            cs[...] = s_n

        res = jnp.where(ok, kkt(cu[...], ch[...], cs[...]), jnp.inf)
        # stall exit mirrors the XLA twin (qp.STALL_ITERS/STALL_RTOL/
        # MU_GRIND): count only in the mu-exhausted grind regime —
        # high-mu plateaus are legitimate progress on hard active sets
        meaningful = res < sst[0] * (1.0 - stall_rtol)
        mu_new = compl(ch[...], cs[...]) / m_total
        grinding = mu_new < mu_grind * mu0
        since = jnp.where(meaningful | ~grinding, 0, since + 1)

        @pl.when(res < sst[0])
        def _():
            bu[...] = cu[...]
            bh[...] = ch[...]
            bs[...] = cs[...]
            sst[0] = res

        live = ok & (mu_new > 1e-14 * mu0)
        stop = (~live) | (sst[0] <= tol) | (since >= stall_iters)
        return it + 1, stop.astype(jnp.int32), since

    it_f, stop_f, since_f = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.int32(0), since0))
    bres[0, 0] = sst[0]
    bit[0, 0] = it_f
    bstop[0, 0] = stop_f
    bsince[0, 0] = since_f


def _prepare_kernel(Hp, gpr, Gthr, dhr, mh, Gtsr, sr, uw, lhw, sw, fl,
                    # outputs
                    Gtho, Gtso, dho, sdo, u0o, h0o, s0o, qso, scho, scso,
                    *, m_total: int, ws_floor: float, ws_cap: float):
    """Everything solve_qp_soft does BEFORE the Mehrotra loop, fused.

    Transliterates ocp/qp.py's pre-loop block (row equilibration, the
    central-path cold start at the dual scale, the duals-only warm-start
    assembly with the staleness-scaled complementarity band, and the
    warm-vs-cold KKT acceptance) — the two recipes must change together.
    Raw rows come in unpadded-value/padded-shape; every derived quantity
    is mask-forced to the loop kernel's padding conventions (hard pads:
    d=1, slack=1, dual=0; soft pads: lo=-1, hi=1, z=0, Z=1, slacks=1,
    duals=0; weight rows 0).

    Inputs: sr = [lo, hi, zl, zu, Zl, Zu, mask] raw rows (the last row is
    the soft-row mask sentinel); uw/lhw/sw the raw (unscaled) warm-start
    rows, sw = [sl, su, lU, lL, nl, nu]; fl[0,0] = ws_valid flag.
    Outputs mirror the loop kernel's inputs plus the two equilibration
    scale rows (for the XLA-side final un-scaling).
    """
    f32 = jnp.float32

    def dotg(a, b, ca, cb):
        return jax.lax.dot_general(
            a, b, (((ca,), (cb,)), ((), ())),
            preferred_element_type=f32, precision=_HIGH)

    m_hv = mh[...]
    # hard rows: per-row inf-norm equilibration (rows are lanes of G^T)
    Gth = Gthr[...]
    sch = jnp.where(m_hv > 0,
                    jnp.maximum(jnp.max(jnp.abs(Gth), axis=0, keepdims=True),
                                1e-10), 1.0)
    Gth_s = Gth / sch
    dhs = jnp.where(m_hv > 0, dhr[...] / sch, 1.0)
    w_hrow = m_hv / (1.0 + jnp.abs(dhs))

    # soft rows; the mask rides in as sr's sentinel row (1 on real rows)
    Gts = Gtsr[...]
    ms_row = sr[6:7]
    scs = jnp.where(ms_row > 0,
                    jnp.maximum(jnp.max(jnp.abs(Gts), axis=0, keepdims=True),
                                1e-10), 1.0)
    Gts_s = Gts / scs
    lo = jnp.where(ms_row > 0, sr[0:1] / scs, -1.0)
    hi = jnp.where(ms_row > 0, sr[1:2] / scs, 1.0)
    zl_ = jnp.where(ms_row > 0, sr[2:3] * scs, 0.0)
    zu_ = jnp.where(ms_row > 0, sr[3:4] * scs, 0.0)
    Zl_ = jnp.where(ms_row > 0, sr[4:5] * scs * scs, 1.0)
    Zu_ = jnp.where(ms_row > 0, sr[5:6] * scs * scs, 1.0)
    wU = ms_row / (1.0 + jnp.abs(hi))
    wL = ms_row / (1.0 + jnp.abs(lo))

    qscale = 1.0 + jnp.max(jnp.abs(gpr[...])) + jnp.max(zl_)
    mu0 = qscale

    # central-path cold start at the dual scale (s*lam = mu0 per pair)
    th0 = jnp.where(m_hv > 0, jnp.maximum(dhs, 1.0), 1.0)
    lh0 = jnp.where(m_hv > 0, mu0 / th0, 0.0)
    one_s = jnp.ones_like(ms_row)
    tU0 = jnp.where(ms_row > 0, jnp.maximum(hi + 1.0, 1.0), 1.0)
    tL0 = jnp.where(ms_row > 0, jnp.maximum(-lo + 1.0, 1.0), 1.0)
    sl0 = one_s
    su0 = one_s
    lU0 = jnp.where(ms_row > 0, mu0 / tU0, 0.0)
    lL0 = jnp.where(ms_row > 0, mu0 / tL0, 0.0)
    nl0 = jnp.where(ms_row > 0, mu0, 0.0)
    nu0 = nl0

    # duals-only warm start: carried (unscaled) quantities map into this
    # call's row scaling; staleness = stationarity of the carried pair
    lh_w = lhw[...] * sch
    sl_w = sw[0:1] / scs
    su_w = sw[1:2] / scs
    lU_w = sw[2:3] * scs
    lL_w = sw[3:4] * scs
    nl_w = sw[4:5] * scs
    nu_w = sw[5:6] * scs

    r_w = (dotg(uw[...], Hp[...], 1, 0) + gpr[...]
           + dotg(lh_w, Gth_s, 1, 1) + dotg(lU_w - lL_w, Gts_s, 1, 1))
    rq = jnp.max(jnp.abs(r_w)) / qscale
    tau = jnp.clip(rq, 1e-4, 1.0)
    mu_ws = mu0 * tau
    floor = ws_floor * mu_ws
    cap = ws_cap * mu_ws
    tau_h = tau * (1.0 + jnp.abs(dhs))
    th_w = jnp.where(m_hv > 0, jnp.maximum(dhs, tau_h), 1.0)
    lh_w = jnp.where(m_hv > 0, jnp.clip(lh_w, floor / th_w, cap / th_w), 0.0)
    sl_w = jnp.maximum(sl_w, tau)
    su_w = jnp.maximum(su_w, tau)
    tU_w = jnp.where(ms_row > 0,
                     jnp.maximum(hi + su_w, tau * (1.0 + jnp.abs(hi))), 1.0)
    tL_w = jnp.where(ms_row > 0,
                     jnp.maximum(-lo + sl_w, tau * (1.0 + jnp.abs(lo))), 1.0)
    lU_w = jnp.where(ms_row > 0, jnp.clip(lU_w, floor / tU_w, cap / tU_w), 0.0)
    lL_w = jnp.where(ms_row > 0, jnp.clip(lL_w, floor / tL_w, cap / tL_w), 0.0)
    nl_w = jnp.where(ms_row > 0, jnp.clip(nl_w, floor / sl_w, cap / sl_w), 0.0)
    nu_w = jnp.where(ms_row > 0, jnp.clip(nu_w, floor / su_w, cap / su_w), 0.0)
    sl_w = jnp.where(ms_row > 0, sl_w, 1.0)
    su_w = jnp.where(ms_row > 0, su_w, 1.0)

    def kkt0(th, lh, tU, tL, sl, su, lU, lL, nl, nu_):
        """KKT residual at u = 0 (both start candidates sit there)."""
        r1 = gpr[...] + dotg(lh, Gth_s, 1, 1) + dotg(lU - lL, Gts_s, 1, 1)
        r_stat = jnp.max(jnp.abs(r1)) / qscale
        rp_h = jnp.abs(th - dhs) * w_hrow
        rp_s = jnp.maximum(jnp.abs(tU - su - hi) * wU,
                           jnp.abs(tL - sl + lo) * wL)
        r_prim = jnp.maximum(jnp.max(rp_h), jnp.max(rp_s))
        compl = (jnp.sum(th * lh) + jnp.sum(tU * lU) + jnp.sum(tL * lL)
                 + jnp.sum(sl * nl) + jnp.sum(su * nu_))
        return jnp.maximum(jnp.maximum(r_stat, r_prim),
                           compl / (m_total * qscale))

    valid = ((fl[0, 0] > 0.0) & (rq < 1e-2)
             & (kkt0(th_w, lh_w, tU_w, tL_w, sl_w, su_w,
                     lU_w, lL_w, nl_w, nu_w)
                <= kkt0(th0, lh0, tU0, tL0, sl0, su0, lU0, lL0, nl0, nu0)))

    Gtho[...] = Gth_s
    Gtso[...] = Gts_s
    dho[0:1, :] = dhs
    dho[1:2, :] = w_hrow
    sdo[0:1, :] = lo
    sdo[1:2, :] = hi
    sdo[2:3, :] = zl_
    sdo[3:4, :] = zu_
    sdo[4:5, :] = Zl_
    sdo[5:6, :] = Zu_
    sdo[6:7, :] = wU
    sdo[7:8, :] = wL
    u0o[...] = jnp.zeros_like(uw[...])
    h0o[0:1, :] = jnp.where(valid, th_w, th0)
    h0o[1:2, :] = jnp.where(valid, lh_w, lh0)
    s0o[0:1, :] = jnp.where(valid, tU_w, tU0)
    s0o[1:2, :] = jnp.where(valid, tL_w, tL0)
    s0o[2:3, :] = jnp.where(valid, sl_w, sl0)
    s0o[3:4, :] = jnp.where(valid, su_w, su0)
    s0o[4:5, :] = jnp.where(valid, lU_w, lU0)
    s0o[5:6, :] = jnp.where(valid, lL_w, lL0)
    s0o[6:7, :] = jnp.where(valid, nl_w, nl0)
    s0o[7:8, :] = jnp.where(valid, nu_w, nu0)
    qso[0] = qscale
    scho[...] = sch
    scso[...] = scs


def run_full(H, g, G_h, d_h, G_s, lo_s, hi_s, zl, zu, Zl, Zu,
             ws, ws_valid, tol: float, reg: float, max_iter: int,
             stall_iters: int = 10, stall_rtol: float = 0.01,
             mu_grind: float = 1e-6, ws_band=(1e-8, 1e12)):
    """The complete fused path of ``solve_qp_soft``: prepare kernel
    (equilibration + start assembly + warm acceptance) feeding the chunked
    Mehrotra loop kernel.  XLA only pads inputs and un-scales outputs.

    Returns ``(best_state_11tuple_scaled, best_res, iters, scale_h,
    scale_s)`` — the same quantities qp.py's XLA twin holds after its
    while_loop, so the caller's status/un-scale tail is shared.
    """
    f32 = jnp.float32
    nU = g.shape[0]
    m_h, m_s = d_h.shape[0], lo_s.shape[0]
    nU_p = max(8, -(-nU // 8) * 8)
    m_hp = -(-m_h // LANES) * LANES
    m_sp = -(-m_s // LANES) * LANES
    m_total = m_h + 4 * m_s

    def padr(rows, m, m_p):
        """Stack 1-D rows and zero-pad the lane axis (values on pads are
        irrelevant: the prepare kernel mask-forces every derived row)."""
        return jnp.pad(jnp.stack([jnp.asarray(r, f32) for r in rows]),
                       ((0, 0), (0, m_p - m)))

    Hp = jnp.zeros((nU_p, nU_p), f32).at[:nU, :nU].set(H)
    Hp = Hp + jnp.diag(jnp.arange(nU_p) >= nU).astype(f32)
    gpr = padr([g], nU, nU_p)
    Gthr = jnp.pad(jnp.asarray(G_h.T, f32),
                   ((0, nU_p - nU), (0, m_hp - m_h)))
    dhr = padr([d_h], m_h, m_hp)
    mh = jnp.zeros((1, m_hp), f32).at[0, :m_h].set(1.0)
    Gtsr = jnp.pad(jnp.asarray(G_s.T, f32),
                   ((0, nU_p - nU), (0, m_sp - m_s)))
    ones_s = jnp.ones((m_s,), f32)
    sr = padr([lo_s, hi_s, zl, zu, Zl, Zu, ones_s], m_s, m_sp)

    if ws is None:
        uw = jnp.zeros((1, nU_p), f32)
        lhw = jnp.zeros((1, m_hp), f32)
        sw = jnp.zeros((6, m_sp), f32)
        flv = jnp.zeros((), f32)
    else:
        (u_w, sl_w, su_w, _, lh_w, _, lU_w, _, lL_w, nl_w, nu_w) = ws
        uw = padr([u_w], nU, nU_p)
        lhw = padr([lh_w], m_h, m_hp)
        sw = padr([sl_w, su_w, lU_w, lL_w, nl_w, nu_w], m_s, m_sp)
        flv = (jnp.ones((), f32) if ws_valid is None
               else jnp.asarray(ws_valid).astype(f32))
    fl = flv.reshape(1, 1)

    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    prep = pl.pallas_call(
        functools.partial(_prepare_kernel, m_total=m_total,
                          ws_floor=float(ws_band[0]),
                          ws_cap=float(ws_band[1])),
        in_specs=[vspec()] * 10 + [sspec()],
        out_specs=[vspec()] * 7 + [sspec()] + [vspec()] * 2,
        out_shape=[jax.ShapeDtypeStruct((nU_p, m_hp), f32),
                   jax.ShapeDtypeStruct((nU_p, m_sp), f32),
                   jax.ShapeDtypeStruct((2, m_hp), f32),
                   jax.ShapeDtypeStruct((8, m_sp), f32),
                   jax.ShapeDtypeStruct((1, nU_p), f32),
                   jax.ShapeDtypeStruct((2, m_hp), f32),
                   jax.ShapeDtypeStruct((8, m_sp), f32),
                   jax.ShapeDtypeStruct((1,), f32),
                   jax.ShapeDtypeStruct((1, m_hp), f32),
                   jax.ShapeDtypeStruct((1, m_sp), f32)],
        interpret=_INTERPRET,
        compiler_params=_COMPILER_PARAMS,
    )
    (Gth, Gts, dh, sd, u0, h0, s0, qsc, sch, scs) = prep(
        Hp, gpr, Gthr, dhr, mh, Gtsr, sr, uw, lhw, sw, fl)

    ms = jnp.zeros((1, m_sp), f32).at[0, :m_s].set(1.0)
    best, bres, it_tot = _run_chunks(
        Hp, gpr, Gth, dh, mh, Gts, sd, ms, u0, h0, s0, qsc[0],
        nU=nU, m_h=m_h, m_s=m_s, m_total=m_total, tol=tol, reg=reg,
        max_iter=max_iter, stall_iters=stall_iters, stall_rtol=stall_rtol,
        mu_grind=mu_grind)
    return best, bres, it_tot, sch[0, :m_h], scs[0, :m_s]


def _run_chunks(Hp, gp, Gth, dh, mh, Gts, sd, ms, u0, h0, s0, qscale,
                *, nU: int, m_h: int, m_s: int, m_total: int,
                tol: float, reg: float, max_iter: int,
                stall_iters: int, stall_rtol: float, mu_grind: float):
    """Chunked Mehrotra loop over already-prepared (scaled, padded) data.

    Returns ``(best_state_11tuple, best_res, iters)``.
    """
    f32 = jnp.float32
    nU_p = Hp.shape[0]
    m_hp = dh.shape[1]
    m_sp = sd.shape[1]

    # qs row: [qscale, remaining-budget, stall-counter, global-best-res];
    # slots 1-3 are refreshed per chunk so the fused path caps at exactly
    # max_iter iterations and keeps XLA-twin stall semantics across chunks
    qs = jnp.stack([jnp.asarray(qscale, f32), jnp.asarray(0.0, f32),
                    jnp.asarray(0.0, f32),
                    jnp.asarray(jnp.inf, f32)]).reshape(1, 4)

    chunk = min(CHUNK, int(max_iter))
    kern = functools.partial(_kernel, nU=nU, m_total=m_total,
                             tol=float(tol), reg=float(reg),
                             max_iter=chunk, stall_iters=int(stall_iters),
                             stall_rtol=float(stall_rtol),
                             mu_grind=float(mu_grind))
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    call = pl.pallas_call(
        kern,
        in_specs=[vspec() for _ in range(11)] + [sspec()],
        out_specs=[vspec()] * 6 + [sspec()] * 4,
        out_shape=[jax.ShapeDtypeStruct((1, nU_p), f32),
                   jax.ShapeDtypeStruct((2, m_hp), f32),
                   jax.ShapeDtypeStruct((8, m_sp), f32),
                   jax.ShapeDtypeStruct((1, nU_p), f32),
                   jax.ShapeDtypeStruct((2, m_hp), f32),
                   jax.ShapeDtypeStruct((8, m_sp), f32),
                   jax.ShapeDtypeStruct((1, 1), f32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((1, nU_p), f32), pltpu.VMEM((2, m_hp), f32),
            pltpu.VMEM((8, m_sp), f32),
            pltpu.VMEM((1, nU_p), f32), pltpu.VMEM((2, m_hp), f32),
            pltpu.VMEM((8, m_sp), f32),
            pltpu.VMEM((nU_p, nU_p), f32),
            pltpu.VMEM((1, m_hp), f32), pltpu.VMEM((1, m_hp), f32),
            pltpu.VMEM((10, m_sp), f32),
            pltpu.VMEM((1, nU_p), f32),
            pltpu.SMEM((2,), f32),
        ],
        interpret=_INTERPRET,
        compiler_params=_COMPILER_PARAMS,
    )

    # chunked outer loop: each trip runs one fixed-size kernel chunk from
    # the CURRENT iterate and merges its chunk-best into the running best
    def cond(c):
        _, _, _, _, _, _, _, it_tot, stop, _ = c
        return (it_tot < max_iter) & (stop == 0)

    def body(c):
        u_c, h_c, s_c, bu, bh, bs, bres, it_tot, _, since = c
        qs_c = (qs.at[0, 1].set((jnp.int32(max_iter) - it_tot)
                                .astype(f32))
                  .at[0, 2].set(since.astype(f32))
                  .at[0, 3].set(bres))
        (u_n, h_n, s_n, kbu, kbh, kbs, kres, kit, kstop, ksince) = call(
            Hp, gp, Gth, dh, mh, Gts, sd, ms, u_c, h_c, s_c, qs_c)
        kres = kres[0, 0]
        # stall/convergence/death decisions all live IN the kernel (the
        # counter and global best are threaded through qs), so the outer
        # loop only merges bests and forwards the kernel's stop flag
        better = kres < bres
        bu = jnp.where(better, kbu, bu)
        bh = jnp.where(better, kbh, bh)
        bs = jnp.where(better, kbs, bs)
        bres = jnp.minimum(kres, bres)
        return (u_n, h_n, s_n, bu, bh, bs, bres,
                it_tot + kit[0, 0], kstop[0, 0], ksince[0, 0])

    init = (u0, h0, s0, u0, h0, s0, jnp.asarray(jnp.inf, f32),
            jnp.int32(0), jnp.int32(0), jnp.int32(0))
    (_, _, _, bu, bh, bs, bres, it_tot, _, _) = jax.lax.while_loop(
        cond, body, init)

    best = (bu[0, :nU], bs[2, :m_s], bs[3, :m_s], bh[0, :m_h],
            bh[1, :m_h], bs[0, :m_s], bs[4, :m_s], bs[1, :m_s],
            bs[5, :m_s], bs[6, :m_s], bs[7, :m_s])
    return best, bres, it_tot
