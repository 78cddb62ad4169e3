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
                + 8 * ns * Htl)                         # row quantities


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
    # the min-dist override needs the train targets + distance matrix;
    # mean-as-sample needs the posterior mean returned — both stay XLA
    if hyp.min_data_dist >= 0.0 or spec.mean_as_dyn_sample:
        return False
    # the zero-variance override reduces over the TASK axis of each test
    # point; the in-kernel elementwise form only matches it when Ty == 1
    if hyp.variance_is_zero >= 0.0 and spec.Ty > 1:
        return False
    if ns < 1 or Ht < 2 or R < 1:
        return False
    if _ns_chunk(ns, Ht, R) == 0:
        return False
    if _INTERPRET:
        return True
    return _device_platform() in ("tpu", "axon")


def _kernel(Kx, Ktt, eps, Linv, alpha, pv, mean_o, dg_o, cov3, var_r,
            *, ns: int, Ht: int, jitter: float, beta: float,
            var_zero: float, rel_floor: float):
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
    mu = mean_o[...]
    y = mu + dg_o[...]
    var = jnp.maximum(var_r[...], 0.0)
    if rel_floor > 0.0:
        var = jnp.where(var < rel_floor * pv[...], 0.0, var)
    if var_zero >= 0.0:
        # all tasks of a test POINT below threshold -> mean; rows of one
        # point are contiguous lanes, but the twin reduces over the task
        # axis only — the caller passes var_zero < 0 unless Ty == 1
        y = jnp.where(var <= var_zero, mu, y)
    std = jnp.sqrt(var)
    y = jnp.clip(y, mu - beta * std, mu + beta * std)
    dg_o[...] = jnp.where(jnp.isfinite(y), y, mu)


def sample_empty_one(Kxm, Ktt, eps, Linv, alpha, prior_var,
                     jitter: float, beta: float, var_zero: float,
                     rel_floor: float):
    """Run the fused stage for ONE GP output.

    Args:
        Kxm: (ns, Ht, R) masked cross-covariance blocks.
        Ktt: (ns, Ht, Ht) test-test blocks.
        eps: (ns, Ht) base draws.
        Linv: (R, R) inverse Cholesky factor of the masked train matrix.
        alpha: (R,) K~^-1 y~.
        prior_var: (Ht,) prior variance of each test row's task.
    Returns:
        (ns, Ht) sampled rows.
    """
    f32 = jnp.float32
    ns, Ht, R = Kxm.shape
    chunk = _ns_chunk(ns, Ht, R)
    if chunk and chunk < ns:
        # sample chunks as separate kernel invocations (VMEM-bounded);
        # samples are independent, so this is pure batching
        outs = [sample_empty_one(Kxm[s:s + chunk], Ktt[s:s + chunk],
                                 eps[s:s + chunk], Linv, alpha, prior_var,
                                 jitter, beta, var_zero, rel_floor)
                for s in range(0, ns, chunk)]
        return jnp.concatenate(outs, axis=0)
    kern = functools.partial(_kernel, ns=ns, Ht=Ht, jitter=float(jitter),
                             beta=float(beta), var_zero=float(var_zero),
                             rel_floor=float(rel_floor))
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    mean, dg = pl.pallas_call(
        kern,
        in_specs=[vspec()] * 6,
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
      jnp.broadcast_to(prior_var.astype(f32)[None], (1, Ht)))
    return dg
