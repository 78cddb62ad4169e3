"""Fused empty-hallucination GP stage as one Pallas TPU kernel per output.

Replaces the XLA op chain of ``agent.sample_dynamics(hall_empty=True)``
(predict_real -> safe_cholesky -> posterior_sample -> floors/clips; the
functional analog of the reference's per-SQP-iteration GPyTorch rebuild +
``sample_gp``, ref: src/agent.py:216-272,629-730) for the f32 TPU path.
The stage was measured op-count bound, not FLOP bound: ~25 batched-small
ops at a ~20 us/op launch floor = ~1.0 ms of the 2.7 ms SQP-RTI step at
the bench shape (BENCH_NOTES round-4 stage table), while its arithmetic
is ~0.2 GFLOP.  Here everything after the kernel-matrix evaluation runs
inside ONE kernel invocation per GP output:

  per sample i (dynamic fori, sublane-sliced from the stacked inputs):
      V_i    = Linv (Kx_i ⊙ m)'            (one MXU dot)
      G_i    = V_i' V_i                     (exactly symmetric Gram)
      mean_i = (Kx_i ⊙ m) alpha             (row-layout dot)
      cov_i  = Ktt_i - G_i + jitter I       -> scratch
  batched blocked Cholesky of all ns (Ht, Ht) covariance blocks at once
  (unrolled right-looking sweep over 3D refs — grid programs would
  serialize, so the batch rides the leading axis instead), then per
  sample  y_i = mean_i + eps_i L_i'  (one dot), then the override tail
  (relative variance floor, zero-variance -> mean, beta-clip,
  non-finite -> mean) as whole-array VPU ops.

Design deltas vs the XLA twin, both tolerance-tested (test_pallas_gp):

* the per-sample triangular solve against the SHARED real-data factor
  becomes a matmul with the precomputed ``Linv = L^-1`` (gp/exact.py
  ``factor_real`` now emits it): same O(eps * cond) error class, but a
  dot instead of a sequential substitution;
* ``safe_cholesky``'s escalating-jitter while_loop is dropped — a failed
  factorization propagates NaN into the sample and lands on the same
  non-finite -> posterior-mean backstop the twin ends with
  (ref asserts no-NaN under f64, src/agent.py:698).

The XLA path stays the reference implementation everywhere else (CPU,
f64, hallucination blocks, min-dist override); ``fused_ok`` gates this
kernel to exactly the shapes it handles.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sampling_gpmpc_tpu.ops.batch_linalg import _device_platform

_INTERPRET = False          # flipped by tests to run kernels off-TPU
_HIGH = jax.lax.Precision.HIGHEST
VMEM_BUDGET = 24 * 1024 * 1024
# raise the 16 MB default scoped-vmem limit to match (see pallas_ipm.py)
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
# in-kernel loop unrolling (tunable for compile-time/runtime experiments):
# SGPMPC_GP_UNROLL = "<ns-loops 0/1>,<chol 0=dynamic 1=full>"; Mosaic's
# in-kernel fori lowering supports ONLY unroll=1 or full unroll, and full
# unroll of the 3D chol sweep was measured at >9 min compile — default to
# the dynamic loop for both
_u = os.environ.get("SGPMPC_GP_UNROLL", "1,0").split(",")
NS_UNROLL = bool(int(_u[0]))
CHOL_FULL_UNROLL = bool(int(_u[1]))


def _kernel_vmem(ns: int, Ht: int, R: int) -> int:
    rnd = lambda x, m: -(-x // m) * m
    Rp = rnd(R, 128)
    Htl = rnd(Ht, 128)
    return 4 * (ns * rnd(Ht, 8) * (2 * Rp + 2 * Htl)   # Kx, Ktt, cov, chol
                + rnd(R, 8) * Rp                        # Linv
                + 10 * ns * Htl)                        # row quantities


def _ns_chunk(ns: int, Ht: int, R: int) -> int:
    """Largest power-of-2 divisor of ns whose kernel fits VMEM_BUDGET
    (0 if even an 8-sample chunk does not fit — large ns runs as several
    kernel invocations over sample chunks, e.g. ns=512 at the pendulum1D
    shape needs ~67 MB whole but fits in 4 x 128-sample calls)."""
    c = ns
    while c >= 8 and (ns % c or _kernel_vmem(c, Ht, R) > VMEM_BUDGET):
        c //= 2
    return c if c >= 8 and ns % c == 0 else 0


def fused_ok(spec, hyp, dtype, ns: int, Ht: int, R: int) -> bool:
    """Static gate: can the fused kernel run this GP stage?"""
    if os.environ.get("SGPMPC_NO_PALLAS") or os.environ.get("SGPMPC_NO_FUSED_GP"):
        return False
    if dtype != jnp.float32:
        return False
    # mean-as-sample needs the posterior mean returned — stays XLA
    # (min-dist and the Ty>1 zero-variance override run IN-kernel from
    # XLA-precomputed close/ynear rows and a lane-group reduction)
    if spec.mean_as_dyn_sample:
        return False
    if ns < 1 or Ht < 2 or R < 1:
        return False
    if _ns_chunk(ns, Ht, R) == 0:
        return False
    if _INTERPRET:
        return True
    return _device_platform() in ("tpu", "axon")



def _override_tail(mean_o, dg_o, var_r, pv, close, ynear,
                   *, ty: int, beta: float, var_zero: float,
                   rel_floor: float, use_min_dist: bool):
    """Shared post-draw override pipeline of both fused kernels.

    Mirrors exact.sample_with_overrides order exactly: relative variance
    floor -> zero-variance(point)->mean -> min-dist->nearest-train-row ->
    beta-clip -> non-finite->mean.  The Ty>1 zero-variance override
    reduces over each test POINT's ty contiguous lanes via one dot with
    the block-diagonal group matrix (a lane-group AND as a count).
    ``close``/``ynear`` are (ns, Ht) rows precomputed by XLA from the
    train-distance matrix (shared with the hallucination dedup filter).
    """
    f32 = jnp.float32
    mu = mean_o[...]
    y = mu + dg_o[...]
    var = jnp.maximum(var_r[...], 0.0)
    if rel_floor > 0.0:
        var = jnp.where(var < rel_floor * pv[...], 0.0, var)
    if var_zero >= 0.0:
        if ty <= 1:
            y = jnp.where(var <= var_zero, mu, y)
        else:
            Ht = y.shape[-1]
            ra = jax.lax.broadcasted_iota(jnp.int32, (Ht, Ht), 0)
            ca = jax.lax.broadcasted_iota(jnp.int32, (Ht, Ht), 1)
            Gm = jnp.where(ra // ty == ca // ty, 1.0, 0.0).astype(f32)
            z = (var <= var_zero).astype(f32)
            cnt = jax.lax.dot_general(
                z, Gm, (((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=_HIGH)
            y = jnp.where(cnt >= ty - 0.5, mu, y)
    if use_min_dist:
        y = jnp.where(close[...] > 0.0, ynear[...], y)
    std = jnp.sqrt(var)
    y = jnp.clip(y, mu - beta * std, mu + beta * std)
    dg_o[...] = jnp.where(jnp.isfinite(y), y, mu)


def _kernel(Kx, Ktt, eps, Linv, alpha, pv, close, ynear,
            mean_o, dg_o, cov3, var_r,
            *, ns: int, Ht: int, ty: int, jitter: float, beta: float,
            var_zero: float, rel_floor: float, use_min_dist: bool):
    """One GP output's whole sample stage; see module docstring.

    Refs: Kx (ns*Ht, R) masked cross-covariance rows; Ktt (ns*Ht, Ht)
    stacked test-test blocks; eps (ns, Ht) base draws; Linv (R, R);
    alpha (1, R); pv (1, Ht) prior task variances per test row.
    Outputs mean_o/dg_o (ns, Ht); scratch cov3 (ns, Ht, Ht), var_r (ns, Ht).
    """
    f32 = jnp.float32
    rows = jax.lax.broadcasted_iota(jnp.int32, (Ht, Ht), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (Ht, Ht), 1)
    eye = jnp.where(rows == cols, 1.0, 0.0).astype(f32)

    def dotg(a, b, ca, cb):
        return jax.lax.dot_general(
            a, b, (((ca,), (cb,)), ((), ())),
            preferred_element_type=f32, precision=_HIGH)

    # ---- per-sample posterior blocks ------------------------------------
    def post_body(i, _):
        Kx_i = Kx[pl.ds(i * Ht, Ht), :]                 # (Ht, R)
        Ktt_i = Ktt[pl.ds(i * Ht, Ht), :]               # (Ht, Ht)
        V = dotg(Linv[...], Kx_i, 1, 1)                 # (R, Ht)
        G = dotg(V, V, 0, 0)                            # (Ht, Ht), symmetric
        S = Ktt_i - G + jitter * eye
        cov3[pl.ds(i, 1), :, :] = S[None]
        mean_o[pl.ds(i, 1), :] = dotg(alpha[...], Kx_i, 1, 1)   # (1, Ht)
        # diagonal as a ROW via a masked sublane reduction
        var_r[pl.ds(i, 1), :] = (jnp.sum(S * eye, axis=0, keepdims=True)
                                 - jitter)
        return 0

    jax.lax.fori_loop(0, ns, post_body, 0, unroll=NS_UNROLL)

    # ---- batched Cholesky over all ns blocks at once --------------------
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (ns, Ht, Ht), 1)
    cols3 = jax.lax.broadcasted_iota(jnp.int32, (ns, Ht, Ht), 2)
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (ns, 1, Ht), 2)

    def chol_step(j, _):
        A = cov3[...]
        rowj = cov3[:, pl.ds(j, 1), :]                  # (ns, 1, Ht)
        piv = jnp.sum(jnp.where(lane3 == j, rowj, 0.0), axis=2,
                      keepdims=True)                    # (ns, 1, 1)
        r = jax.lax.rsqrt(piv)
        colj = jnp.sum(jnp.where(cols3 == j, A, 0.0), axis=2,
                       keepdims=True)                   # (ns, Ht, 1)
        lj = jnp.where(rows3[:, :, :1] >= j, colj * r, 0.0)
        f1 = jnp.where(rows3[:, :, :1] > j, colj * r, 0.0)
        f2 = jnp.where(cols3[:, :1, :] > j, rowj * r, 0.0)
        cov3[...] = jnp.where(cols3 == j, lj, A - f1 * f2)
        return 0

    # Unlike the IPM's (nU, nU) row sweeps, unrolling here is a net LOSS:
    # each step touches (ns, Ht, Ht) 3D arrays whose leading dim Mosaic
    # expands per op, so a 60-step unroll produced tens of thousands of
    # tile ops and MINUTES of compile time (measured: standalone kernel
    # compile > 9 min unrolled vs seconds dynamic).  The dynamic loop's
    # per-trip overhead amortizes over the large 3D bodies.  (Mosaic
    # lowers in-kernel fori only at unroll=1 or full unroll.)
    jax.lax.fori_loop(0, Ht, chol_step, 0,
                      unroll=Ht if CHOL_FULL_UNROLL else 1)
    cov3[...] = jnp.where(rows3 >= cols3, cov3[...], 0.0)

    # ---- per-sample pathwise draw y = mean + eps L' ---------------------
    def draw_body(i, _):
        L_i = cov3[pl.ds(i, 1), :, :].reshape(Ht, Ht)
        dg_o[pl.ds(i, 1), :] = dotg(eps[pl.ds(i, 1), :], L_i, 1, 1)
        return 0

    jax.lax.fori_loop(0, ns, draw_body, 0, unroll=NS_UNROLL)

    # ---- override tail (whole-batch VPU ops) ----------------------------
    _override_tail(mean_o, dg_o, var_r, pv, close, ynear, ty=ty,
                   beta=beta, var_zero=var_zero, rel_floor=rel_floor,
                   use_min_dist=use_min_dist)


def _hall_kernel(nh_ref, Kxr, Kxh, Ktt, Arh, Ahh, yh, eps, Linv, w_r, pv,
                 close, ynear, mean_o, dg_o, S3, W3, cov3, var_r,
                 *, ns: int, Ht: int, Rr: int, Rh: int, ty: int,
                 jitter: float, beta: float, var_zero: float,
                 rel_floor: float, use_min_dist: bool):
    """One GP output's whole HALL-BLOCK sample stage (SQP iterations >= 1).

    Fused equivalent of condition_update + predict_update +
    sample_with_overrides (gp/exact.py) for one output: per sample the
    block-Cholesky pieces against the FIXED real factor become matmuls
    with the precomputed ``Linv`` (C = Linv A_rh, V_r = Linv Kxr'), the
    per-sample (Rh, Rh) Schur blocks are factorized by the batched
    in-kernel sweep, and the per-sample triangular solves against L_s
    run as ONE batched column-substitution sweep in the TRANSPOSED
    layout (X = B L_s^-T), which needs no in-kernel transposes: the
    row-major blocks Kxh_i (Ht, Rh) are already the transposed RHS.

    Refs: Kxr (ns*Ht, Rr) masked; Kxh (ns*Ht, Rh) masked; Ktt
    (ns*Ht, Ht); Arh (ns*Rr, Rh) masked; Ahh (ns*Rh, Rh) masked +
    noise + identity-fill; yh (ns, Rh) masked targets; eps (ns, Ht);
    Linv (Rr, Rr); w_r (1, Rr); pv (1, Ht).
    Outputs mean_o/dg_o (ns, Ht); scratch S3 (ns, Rh, Rh),
    W3 (ns, Ht+1, Rh), cov3 (ns, Ht, Ht), var_r (ns, Ht).
    """
    f32 = jnp.float32
    rows = jax.lax.broadcasted_iota(jnp.int32, (Ht, Ht), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (Ht, Ht), 1)
    eye = jnp.where(rows == cols, 1.0, 0.0).astype(f32)
    rowsR = jax.lax.broadcasted_iota(jnp.int32, (Rh, Rh), 0)
    colsR = jax.lax.broadcasted_iota(jnp.int32, (Rh, Rh), 1)
    eyeR = jnp.where(rowsR == colsR, 1.0, 0.0).astype(f32)

    def dotg(a, b, ca, cb):
        return jax.lax.dot_general(
            a, b, (((ca,), (cb,)), ((), ())),
            preferred_element_type=f32, precision=_HIGH)

    # ---- per-sample posterior blocks ------------------------------------
    def post_body(i, _):
        Kxr_i = Kxr[pl.ds(i * Ht, Ht), :]               # (Ht, Rr)
        Kxh_i = Kxh[pl.ds(i * Ht, Ht), :]               # (Ht, Rh)
        Ktt_i = Ktt[pl.ds(i * Ht, Ht), :]               # (Ht, Ht)
        Arh_i = Arh[pl.ds(i * Rr, Rr), :]               # (Rr, Rh)
        Ahh_i = Ahh[pl.ds(i * Rh, Rh), :]               # (Rh, Rh)
        # Linv matmuls carry the same ~eps*cond(L_r) error class as the
        # twin's f32 triangular solves; an in-kernel refinement step
        # against L_r was measured to cost ~10% of the stage with NO
        # observable accuracy change (the residual fused-vs-XLA noise
        # is the variance cancellation at near-deterministic points,
        # present on both paths — see bench.fused_hall_equiv_check)
        Vr = dotg(Linv[...], Kxr_i, 1, 1)               # (Rr, Ht)
        C = dotg(Linv[...], Arh_i, 1, 0)                # (Rr, Rh)
        S3[pl.ds(i, 1), :, :] = (Ahh_i - dotg(C, C, 0, 0)
                                 + jitter * eyeR)[None]
        # transposed substitution RHS: rows 0..Ht-1 = Kxh_i - Vr'C,
        # row Ht = yh_i - w_r C
        W3[pl.ds(i, 1), pl.ds(0, Ht), :] = (
            Kxh_i - dotg(Vr, C, 0, 0))[None]
        W3[pl.ds(i, 1), pl.ds(Ht, 1), :] = (
            yh[pl.ds(i, 1), :] - dotg(w_r[...], C, 1, 0))[None]
        S = Ktt_i - dotg(Vr, Vr, 0, 0)
        cov3[pl.ds(i, 1), :, :] = S[None]
        mean_o[pl.ds(i, 1), :] = dotg(w_r[...], Vr, 1, 0)
        return 0

    jax.lax.fori_loop(0, ns, post_body, 0, unroll=NS_UNROLL)

    # ---- batched Cholesky of the (Rh, Rh) Schur blocks ------------------
    rows3R = jax.lax.broadcasted_iota(jnp.int32, (ns, Rh, Rh), 1)
    cols3R = jax.lax.broadcasted_iota(jnp.int32, (ns, Rh, Rh), 2)
    lane3R = jax.lax.broadcasted_iota(jnp.int32, (ns, 1, Rh), 2)

    def chol_stepR(j, _):
        A = S3[...]
        rowj = S3[:, pl.ds(j, 1), :]
        piv = jnp.sum(jnp.where(lane3R == j, rowj, 0.0), axis=2,
                      keepdims=True)
        r = jax.lax.rsqrt(piv)
        colj = jnp.sum(jnp.where(cols3R == j, A, 0.0), axis=2,
                       keepdims=True)
        lj = jnp.where(rows3R[:, :, :1] >= j, colj * r, 0.0)
        f1 = jnp.where(rows3R[:, :, :1] > j, colj * r, 0.0)
        f2 = jnp.where(cols3R[:, :1, :] > j, rowj * r, 0.0)
        S3[...] = jnp.where(cols3R == j, lj, A - f1 * f2)
        return 0

    # DYNAMIC bound: rows/cols >= the fill count are identity rows of S
    # (empty slots are masked to zero couplings), so their sweep steps
    # are exact no-ops for everything the later phases read — bounding
    # both sweeps by the fill makes iteration k cost O(k*H*Ty), not
    # O(capacity) (the car workload fills 60/240 rows at iteration 1)
    nh = nh_ref[0]
    jax.lax.fori_loop(0, nh, chol_stepR, 0, unroll=1)

    # ---- batched transposed substitution: W <- W L_s^-T -----------------
    # Solving X L_s' = B column by column: X[:, j] = (B[:, j] -
    # sum_{k<j} X[:, k] L_s[j, k]) / L_s[j, j]; columns < j of W3 are
    # final, columns >= j still hold B, and the k<j mask excludes them.
    cols3W = jax.lax.broadcasted_iota(jnp.int32, (ns, Ht + 1, Rh), 2)
    laneW = jax.lax.broadcasted_iota(jnp.int32, (ns, 1, Rh), 2)

    def subst_step(j, _):
        X = W3[...]
        Lrow = S3[:, pl.ds(j, 1), :]                    # (ns, 1, Rh)
        piv = jnp.sum(jnp.where(laneW == j, Lrow, 0.0), axis=2,
                      keepdims=True)                    # (ns, 1, 1)
        lmask = jnp.where(laneW < j, Lrow, 0.0)
        contrib = jnp.sum(X * lmask, axis=2, keepdims=True)  # (ns,Ht+1,1)
        bj = jnp.sum(jnp.where(cols3W == j, X, 0.0), axis=2,
                     keepdims=True)
        newc = (bj - contrib) / piv
        W3[...] = jnp.where(cols3W == j, newc, X)
        return 0

    jax.lax.fori_loop(0, nh, subst_step, 0, unroll=1)

    # ---- fold the hall contribution into cov/mean -----------------------
    def fold_body(i, _):
        VhT = W3[pl.ds(i, 1), pl.ds(0, Ht), :].reshape(Ht, Rh)
        whr = W3[pl.ds(i, 1), pl.ds(Ht, 1), :].reshape(1, Rh)
        S = cov3[pl.ds(i, 1), :, :].reshape(Ht, Ht)
        S = S - dotg(VhT, VhT, 1, 1) + jitter * eye
        cov3[pl.ds(i, 1), :, :] = S[None]
        mean_o[pl.ds(i, 1), :] = (mean_o[pl.ds(i, 1), :]
                                  + dotg(whr, VhT, 1, 1))
        var_r[pl.ds(i, 1), :] = (jnp.sum(S * eye, axis=0, keepdims=True)
                                 - jitter)
        return 0

    jax.lax.fori_loop(0, ns, fold_body, 0, unroll=NS_UNROLL)

    # ---- batched Cholesky of the (Ht, Ht) covariances -------------------
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (ns, Ht, Ht), 1)
    cols3 = jax.lax.broadcasted_iota(jnp.int32, (ns, Ht, Ht), 2)
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (ns, 1, Ht), 2)

    def chol_step(j, _):
        A = cov3[...]
        rowj = cov3[:, pl.ds(j, 1), :]
        piv = jnp.sum(jnp.where(lane3 == j, rowj, 0.0), axis=2,
                      keepdims=True)
        r = jax.lax.rsqrt(piv)
        colj = jnp.sum(jnp.where(cols3 == j, A, 0.0), axis=2,
                       keepdims=True)
        lj = jnp.where(rows3[:, :, :1] >= j, colj * r, 0.0)
        f1 = jnp.where(rows3[:, :, :1] > j, colj * r, 0.0)
        f2 = jnp.where(cols3[:, :1, :] > j, rowj * r, 0.0)
        cov3[...] = jnp.where(cols3 == j, lj, A - f1 * f2)
        return 0

    jax.lax.fori_loop(0, Ht, chol_step, 0,
                      unroll=Ht if CHOL_FULL_UNROLL else 1)
    cov3[...] = jnp.where(rows3 >= cols3, cov3[...], 0.0)

    # ---- per-sample pathwise draw y = mean + eps L' ---------------------
    def draw_body(i, _):
        L_i = cov3[pl.ds(i, 1), :, :].reshape(Ht, Ht)
        dg_o[pl.ds(i, 1), :] = dotg(eps[pl.ds(i, 1), :], L_i, 1, 1)
        return 0

    jax.lax.fori_loop(0, ns, draw_body, 0, unroll=NS_UNROLL)

    # ---- override tail (shared with _kernel) ----------------------------
    _override_tail(mean_o, dg_o, var_r, pv, close, ynear, ty=ty,
                   beta=beta, var_zero=var_zero, rel_floor=rel_floor,
                   use_min_dist=use_min_dist)


def _hall_kernel_vmem(ns: int, Ht: int, Rr: int, Rh: int) -> int:
    rnd = lambda x, m: -(-x // m) * m
    Rrp, Rhp, Htl = rnd(Rr, 128), rnd(Rh, 128), rnd(Ht, 128)
    return 4 * (ns * rnd(Ht, 8) * (Rrp + Rhp + Htl)      # Kxr, Kxh, Ktt
                + ns * rnd(Rr, 8) * Rhp                  # Arh
                + 2 * ns * rnd(Rh, 8) * Rhp              # Ahh, S3
                + ns * rnd(Ht + 1, 8) * Rhp              # W3
                + ns * rnd(Ht, 8) * Htl                  # cov3
                + rnd(Rr, 8) * Rrp                       # Linv
                + 10 * ns * Htl)                         # row quantities


def _hall_ns_chunk(ns: int, Ht: int, Rr: int, Rh: int) -> int:
    c = ns
    while c >= 4 and (ns % c or _hall_kernel_vmem(c, Ht, Rr, Rh)
                      > VMEM_BUDGET):
        c //= 2
    return c if c >= 4 and ns % c == 0 else 0


def fused_hall_ok(spec, hyp, dtype, ns: int, Ht: int, Rr: int,
                  Rh: int) -> bool:
    """Static gate for the hall-block fused kernel (same exclusions as
    :func:`fused_ok` plus its own VMEM sizing)."""
    if os.environ.get("SGPMPC_NO_PALLAS") or os.environ.get("SGPMPC_NO_FUSED_GP"):
        return False
    if dtype != jnp.float32:
        return False
    if spec.mean_as_dyn_sample:
        return False
    if ns < 1 or Ht < 2 or Rr < 1 or Rh < 1:
        return False
    if _hall_ns_chunk(ns, Ht, Rr, Rh) == 0:
        return False
    if _INTERPRET:
        return True
    return _device_platform() in ("tpu", "axon")


def sample_hall_one(nh_rows, Kxr, Kxh, Ktt, Arh, Ahh, yh, eps, Linv, w_r,
                    prior_var, jitter: float, beta: float,
                    var_zero: float, rel_floor: float, ty: int = 1,
                    close=None, ynear=None):
    """Run the fused HALL-BLOCK stage for ONE GP output.

    Args:
        nh_rows: scalar int32 — FILLED hall rows (hall_n * Ty); bounds
            the in-kernel sweeps (exact: the remaining rows are
            identity/zero padding).
        Kxr: (ns, Ht, Rr) masked cross-covariance to the real block.
        Kxh: (ns, Ht, Rh) masked cross-covariance to the hall block.
        Ktt: (ns, Ht, Ht) test-test blocks.
        Arh: (ns, Rr, Rh) masked real-hall cross blocks.
        Ahh: (ns, Rh, Rh) masked hall covariance (+noise, identity fill).
        yh: (ns, Rh) masked hall targets.
        eps: (ns, Ht) base draws.
        Linv: (Rr, Rr) inverse Cholesky factor of the real block.
        w_r: (Rr,) L_r^-1 y~_r.
        prior_var: (Ht,) prior variance of each test row's task.
    Returns:
        (ns, Ht) sampled rows.
    """
    f32 = jnp.float32
    ns, Ht, Rr = Kxr.shape
    Rh = Kxh.shape[-1]
    use_md = close is not None
    if not use_md:
        close = jnp.zeros((ns, Ht), f32)
        ynear = jnp.zeros((ns, Ht), f32)
    chunk = _hall_ns_chunk(ns, Ht, Rr, Rh)
    if chunk and chunk < ns:
        outs = [sample_hall_one(nh_rows, Kxr[s:s + chunk],
                                Kxh[s:s + chunk],
                                Ktt[s:s + chunk], Arh[s:s + chunk],
                                Ahh[s:s + chunk], yh[s:s + chunk],
                                eps[s:s + chunk], Linv, w_r,
                                prior_var, jitter, beta, var_zero,
                                rel_floor, ty=ty,
                                close=close[s:s + chunk],
                                ynear=ynear[s:s + chunk])
                for s in range(0, ns, chunk)]
        return jnp.concatenate(outs, axis=0)
    kern = functools.partial(_hall_kernel, ns=ns, Ht=Ht, Rr=Rr, Rh=Rh,
                             ty=int(ty), jitter=float(jitter),
                             beta=float(beta), var_zero=float(var_zero),
                             rel_floor=float(rel_floor),
                             use_min_dist=use_md)
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    mean, dg = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vspec()] * 12,
        out_specs=[vspec()] * 2,
        out_shape=[jax.ShapeDtypeStruct((ns, Ht), f32),
                   jax.ShapeDtypeStruct((ns, Ht), f32)],
        scratch_shapes=[pltpu.VMEM((ns, Rh, Rh), f32),
                        pltpu.VMEM((ns, Ht + 1, Rh), f32),
                        pltpu.VMEM((ns, Ht, Ht), f32),
                        pltpu.VMEM((ns, Ht), f32)],
        interpret=_INTERPRET,
        compiler_params=_COMPILER_PARAMS,
    )(jnp.asarray(nh_rows, jnp.int32).reshape(1),
      Kxr.reshape(ns * Ht, Rr).astype(f32),
      Kxh.reshape(ns * Ht, Rh).astype(f32),
      Ktt.reshape(ns * Ht, Ht).astype(f32),
      Arh.reshape(ns * Rr, Rh).astype(f32),
      Ahh.reshape(ns * Rh, Rh).astype(f32),
      yh.astype(f32), eps.astype(f32), Linv.astype(f32),
      w_r.reshape(1, Rr).astype(f32),
      jnp.broadcast_to(prior_var.astype(f32)[None], (1, Ht)),
      close.astype(f32), ynear.astype(f32))
    return dg


def sample_empty_one(Kxm, Ktt, eps, Linv, alpha, prior_var,
                     jitter: float, beta: float, var_zero: float,
                     rel_floor: float, ty: int = 1,
                     close=None, ynear=None):
    """Run the fused stage for ONE GP output.

    Args:
        Kxm: (ns, Ht, R) masked cross-covariance blocks.
        Ktt: (ns, Ht, Ht) test-test blocks.
        eps: (ns, Ht) base draws.
        Linv: (R, R) inverse Cholesky factor of the masked train matrix.
        alpha: (R,) K~^-1 y~.
        prior_var: (Ht,) prior variance of each test row's task.
        ty: tasks per test point (for the Ty>1 zero-variance override).
        close/ynear: optional (ns, Ht) min-dist override rows (mask > 0
            selects the nearest-train-row replacement in ``ynear``).
    Returns:
        (ns, Ht) sampled rows.
    """
    f32 = jnp.float32
    ns, Ht, R = Kxm.shape
    use_md = close is not None
    if not use_md:
        close = jnp.zeros((ns, Ht), f32)
        ynear = jnp.zeros((ns, Ht), f32)
    chunk = _ns_chunk(ns, Ht, R)
    if chunk and chunk < ns:
        # sample chunks as separate kernel invocations (VMEM-bounded);
        # samples are independent, so this is pure batching
        outs = [sample_empty_one(Kxm[s:s + chunk], Ktt[s:s + chunk],
                                 eps[s:s + chunk], Linv, alpha, prior_var,
                                 jitter, beta, var_zero, rel_floor,
                                 ty=ty, close=close[s:s + chunk],
                                 ynear=ynear[s:s + chunk])
                for s in range(0, ns, chunk)]
        return jnp.concatenate(outs, axis=0)
    kern = functools.partial(_kernel, ns=ns, Ht=Ht, ty=int(ty),
                             jitter=float(jitter),
                             beta=float(beta), var_zero=float(var_zero),
                             rel_floor=float(rel_floor),
                             use_min_dist=use_md)
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    mean, dg = pl.pallas_call(
        kern,
        in_specs=[vspec()] * 8,
        out_specs=[vspec()] * 2,
        out_shape=[jax.ShapeDtypeStruct((ns, Ht), f32),
                   jax.ShapeDtypeStruct((ns, Ht), f32)],
        scratch_shapes=[pltpu.VMEM((ns, Ht, Ht), f32),
                        pltpu.VMEM((ns, Ht), f32)],
        interpret=_INTERPRET,
        compiler_params=_COMPILER_PARAMS,
    )(Kxm.reshape(ns * Ht, R).astype(f32),
      Ktt.reshape(ns * Ht, Ht).astype(f32),
      eps.astype(f32), Linv.astype(f32),
      alpha.reshape(1, R).astype(f32),
      jnp.broadcast_to(prior_var.astype(f32)[None], (1, Ht)),
      close.astype(f32), ynear.astype(f32))
    return dg
