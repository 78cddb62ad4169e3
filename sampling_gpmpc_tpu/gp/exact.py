"""Batched exact GP conditioning with masked (NaN) observations.

Functional replacement for the reference's per-SQP-iteration GPyTorch model
rebuild (ref: src/agent.py:216-272) and posterior sampling
(ref: src/agent.py:629-730).  Missing observations are handled by the mask
trick instead of GPyTorch's ``observation_nan_policy("mask")``:

    K~ = m m^T ⊙ (K + Σ_noise) + diag(1 - m),    y~ = m ⊙ y

which leaves masked rows with zero posterior influence while keeping every
shape static (what XLA wants — no dynamic data removal).

All public entry points operate on a single (sample, output) pair and are
vmapped over the ``(ns, g_ny)`` batch by callers.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from sampling_gpmpc_tpu.setup import full_precision

from sampling_gpmpc_tpu.gp.kernel import kernel_matrix


@dataclasses.dataclass(frozen=True)
class GPHyperArrays:
    """Per-output hyperparameters as arrays (pytree; map over g_ny)."""

    lengthscale: jnp.ndarray   # (g_ny, D)
    outputscale: jnp.ndarray   # (g_ny,)
    noise_diag: jnp.ndarray    # (Ty,) per-task observation noise (incl. global)
    jitter: float
    beta: float
    variance_is_zero: float
    min_data_dist: float

    @classmethod
    def from_spec(cls, gp, dtype):
        import numpy as np
        tn = np.asarray(gp.task_noises, dtype=np.float64) + gp.noise
        return cls(
            lengthscale=jnp.asarray(gp.lengthscale, dtype),
            outputscale=jnp.asarray(gp.outputscale, dtype),
            noise_diag=jnp.asarray(tn, dtype),
            jitter=gp.jitter,
            beta=gp.beta,
            variance_is_zero=gp.variance_is_zero,
            min_data_dist=gp.min_data_dist,
        )


jax.tree_util.register_pytree_node(
    GPHyperArrays,
    lambda h: ((h.lengthscale, h.outputscale, h.noise_diag),
               (h.jitter, h.beta, h.variance_is_zero, h.min_data_dist)),
    lambda aux, ch: GPHyperArrays(*ch, *aux),
)




def safe_cholesky(A: jnp.ndarray, jitter: float) -> jnp.ndarray:
    """Cholesky with escalating-jitter retries (psd_safe_cholesky analog).

    The first attempt uses max(configured jitter, dtype floor); on a NaN
    factorization the jitter escalates 10x per retry, capped at
    max(1e-3 * mean diagonal, dtype cap) — the cap is checked against the
    jitter that will actually be applied, so the applied value never
    exceeds it by more than the 10x step.  Escalation rounds refactor the
    whole batch under vmap, hence the dtype floors are chosen so the first
    attempt virtually always succeeds.
    """
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    mean_diag = jnp.mean(jnp.diagonal(A))
    if A.dtype == jnp.float32:
        # single-precision rounding of covariance differences produces
        # negative eigenvalues ~ eps*||K||
        floor, cap = 1e-6, 1e-2
    else:
        floor, cap = 1e-14, 1e-4
    j0 = jnp.maximum(jnp.asarray(jitter, A.dtype), floor)
    cap = jnp.maximum(1e-3 * mean_diag, cap)

    def attempt(j):
        return jnp.linalg.cholesky(A + j * eye)

    L = attempt(j0)

    def body(carry):
        L, j = carry
        j = j * 10.0
        return attempt(j), j

    def cond(carry):
        L, j = carry
        return jnp.any(jnp.isnan(L)) & (j * 10.0 <= cap)

    L, _ = jax.lax.while_loop(cond, body, (L, j0))
    return L


@full_precision
def condition(Z, Y, hyp_ls, hyp_os, noise_diag, jitter, with_grad: bool):
    """Factorize the (masked) train covariance for one (sample, output).

    Args:
        Z: (M, D) train inputs.
        Y: (M, Ty) observations; NaN marks missing entries.
        noise_diag: (Ty,) per-task noise.
    Returns:
        dict with L (R, R), alpha (R,), mask (R,) where R = M * Ty.
    """
    M, Ty = Y.shape
    y = Y.reshape(-1)
    m = (~jnp.isnan(y)).astype(Z.dtype)
    y = jnp.nan_to_num(y)

    K = kernel_matrix(Z, Z, hyp_ls, hyp_os, with_grad and Ty > 1)
    K = K + jnp.diag(jnp.tile(noise_diag, M))
    Km = m[:, None] * K * m[None, :] + jnp.diag(1.0 - m)
    L = safe_cholesky(Km, jitter)
    alpha = jax.scipy.linalg.cho_solve((L, True), m * y)
    return {"L": L, "alpha": alpha, "mask": m}


@full_precision
def predict(Xt, Z, fact, hyp_ls, hyp_os, jitter, with_grad: bool):
    """Joint posterior over H test points x (1+D) tasks.

    The test tasks match the train tasks: value+gradients for the derivative
    GP, value-only otherwise (the reference's ``use_model_without_derivatives``
    flips both sides together, src/agent.py:216-248).

    Returns:
        mean: (Ht,), cov: (Ht, Ht) with Ht = H*(1+D) (or H when value-only),
        point-major interleaved — matching GPyTorch's MultitaskMVN layout.
    """
    R = fact["mask"].shape[0]
    Kall = kernel_matrix(Xt, jnp.concatenate([Z, Xt], axis=0),
                         hyp_ls, hyp_os, with_grad)
    Kx = Kall[:, :R]
    Ktt = Kall[:, R:]

    Kxm = Kx * fact["mask"][None, :]
    mean = Kx @ fact["alpha"]          # masked alpha entries are exactly zero
    V = jax.scipy.linalg.solve_triangular(fact["L"], Kxm.T, lower=True)
    cov = Ktt - V.T @ V
    cov = 0.5 * (cov + cov.T)
    return mean, cov


@full_precision
def posterior_sample(mean, cov, eps, jitter):
    """Pathwise joint sample: mean + chol(cov) @ eps (ref: agent.py:641)."""
    L = safe_cholesky(cov, jitter)
    return mean + L @ eps


def prior_task_variances(hyp_ls, hyp_os, Ty: int):
    """Prior variance of each task at any point: k(x,x) diagonal blocks.

    For the RBF-grad kernel the value task has prior variance
    ``outputscale`` and gradient task d has ``outputscale / ls_d**2``
    (kernel.py closed forms); value-only GPs use just the first entry.
    """
    d_var = hyp_os / (hyp_ls * hyp_ls)
    full = jnp.concatenate([hyp_os[None], d_var])
    return full[:Ty]


def sample_with_overrides(Xt, Z, Y, fact, mean, cov, eps, hyp: GPHyperArrays,
                          Ty_test: int, prior_var=None, dist=None):
    """Full sampling pipeline of the reference's ``sample_gp``
    (ref: src/agent.py:629-730) for one (sample, output) pair.

    Order of operations (must match for parity):
      1. pathwise sample,
      2. zero-variance points -> posterior mean,
      3. points closer than min_data_dist to a train point -> copy that
         train observation,
      4. clip to mean ± beta * std.

    Args:
        Xt: (H, D) test points; Z: (M, D) train inputs; Y: (M, Ty) train obs.
        mean/cov: joint posterior (Ht,), (Ht, Ht).
        eps: (Ht,) base sample.
        prior_var: optional (Ty_test,) prior task variances k(x,x); when
            given, posterior variances below the dtype's cancellation-noise
            floor (relative to the prior) are treated as EXACTLY zero.  The
            f32 ``Ktt - V'V`` subtraction leaves ±1e-6-of-prior noise where
            the true variance is ~0; beta-clipping at beta=30 turns that
            noise floor into ~3e-2 dynamics perturbations per step, which
            marginally-stable realizations amplify exponentially (measured:
            bounded f64 rollouts vs 1e8 blowups in f32).  The reference
            runs this workload in torch f64 where the same noise is 1e-14
            and harmless.
        dist: optional precomputed (H, M) ||Xt - Z|| matrix — the same
            matrix the hallucination dedup filter needs, so callers that
            run both compute it once.
    Returns:
        (H, Ty_test) sampled values(+gradients).
    """
    H = Xt.shape[0]
    y = posterior_sample(mean, cov, eps, hyp.jitter).reshape(H, Ty_test)
    mu = mean.reshape(H, Ty_test)
    var = jnp.clip(jnp.diagonal(cov), 0.0).reshape(H, Ty_test)
    if prior_var is not None:
        rel = 1e-5 if mean.dtype == jnp.float32 else 1e-12
        var = jnp.where(var < rel * prior_var[None, :], 0.0, var)

    if hyp.variance_is_zero >= 0.0:
        all_zero = jnp.all(var <= hyp.variance_is_zero, axis=-1, keepdims=True)
        y = jnp.where(all_zero, mu, y)

    if hyp.min_data_dist >= 0.0:
        if dist is None:
            dist = jnp.linalg.norm(
                Xt[:, None, :] - Z[None, :, :], axis=-1)                 # (H, M)
        row_invalid = jnp.any(jnp.isnan(Y), axis=-1)                     # (M,)
        dist = jnp.where(row_invalid[None, :], jnp.inf, dist)
        close = jnp.any(dist <= hyp.min_data_dist, axis=1, keepdims=True)
        nearest = jnp.argmin(dist, axis=1)                               # (H,)
        y = jnp.where(close, Y[nearest], y)

    std = jnp.sqrt(var)
    y = jnp.clip(y, mu - hyp.beta * std, mu + hyp.beta * std)
    # f32-on-TPU backstop: if the pathwise factorization still failed after
    # jitter escalation, fall back to the posterior mean for those entries
    # (the reference asserts no NaN under f64, src/agent.py:698)
    return jnp.where(jnp.isfinite(y), y, mu)


def batched(fn, in_axes):
    """vmap over (ns, g_ny) with hyperparameters mapped over g_ny only."""
    return jax.vmap(jax.vmap(fn, in_axes=in_axes[1]), in_axes=in_axes[0])


# ---------------------------------------------------------------------------
# Blockwise conditioning: fixed real data factored once, per-sample
# hallucination rows appended by a Cholesky block update (the SURVEY §5
# "growing conditioning set" treatment — replaces the reference's full
# GPyTorch refactorization every SQP iteration, src/agent.py:216-272).
# ---------------------------------------------------------------------------

@full_precision
def factor_real(Z_r, Y_r, hyp_ls, hyp_os, noise_diag, jitter,
                with_grad: bool):
    """Factor the fixed real-data block for one output.

    Returns dict with L_r (R_r, R_r), w_r = L_r^-1 y~_r, mask_r, and the
    (masked) raw y for later use.
    """
    M, Ty = Y_r.shape
    y = Y_r.reshape(-1)
    m = (~jnp.isnan(y)).astype(Z_r.dtype)
    y = jnp.nan_to_num(y) * m

    K = kernel_matrix(Z_r, Z_r, hyp_ls, hyp_os, with_grad and Ty > 1)
    K = K + jnp.diag(jnp.tile(noise_diag, M))
    A = m[:, None] * K * m[None, :] + jnp.diag(1.0 - m)
    L_r = safe_cholesky(A, jitter)
    w_r = jax.scipy.linalg.solve_triangular(L_r, y, lower=True)
    # Linv/alpha: precomputed once per experiment for the fused TPU GP
    # stage (ops/pallas_gp.py), which replaces the per-iteration
    # triangular solves against this FIXED factor with matmuls
    Linv = jax.scipy.linalg.solve_triangular(
        L_r, jnp.eye(L_r.shape[0], dtype=L_r.dtype), lower=True)
    alpha = jax.scipy.linalg.solve_triangular(L_r.T, w_r, lower=False)
    return {"L": L_r, "w": w_r, "mask": m, "Linv": Linv, "alpha": alpha}


@full_precision
def condition_update(rf, Z_r, Z_h, Y_h, hyp_ls, hyp_os, noise_diag, jitter,
                     with_grad: bool):
    """Append hallucination rows to a real-data factorization (block chol).

    With A = [[A_rr, A_rh], [A_hr, A_hh]] the masked train covariance, the
    factor is L = [[L_r, 0], [C', L_s]] with C = L_r^-1 A_rh and
    L_s = chol(A_hh - C'C); only the (R_h, R_h) Schur block is factorized
    per sample.

    Returns dict with C (R_r, R_h), L_s, alpha_r/alpha_h (the split
    K~^-1 y~), masks.
    """
    Mh, Ty = Y_h.shape
    y_h = Y_h.reshape(-1)
    m_h = (~jnp.isnan(y_h)).astype(Z_h.dtype)
    y_h = jnp.nan_to_num(y_h) * m_h
    m_r = rf["mask"]

    grad = with_grad and Ty > 1
    # one kernel evaluation for both cross and self blocks (rows are
    # point-major, so [Z_r; Z_h] vs Z_h splits by row offset); the stage
    # is op-count bound at these shapes (BENCH_NOTES GP-stage profiling)
    R_r = m_r.shape[0]
    K_all = kernel_matrix(jnp.concatenate([Z_r, Z_h], axis=0), Z_h,
                          hyp_ls, hyp_os, grad)
    A_rh = m_r[:, None] * K_all[:R_r] * m_h[None, :]
    K_hh = K_all[R_r:] + jnp.diag(jnp.tile(noise_diag, Mh))
    A_hh = m_h[:, None] * K_hh * m_h[None, :] + jnp.diag(1.0 - m_h)

    C = jax.scipy.linalg.solve_triangular(rf["L"], A_rh, lower=True)
    S = A_hh - C.T @ C
    L_s = safe_cholesky(0.5 * (S + S.T), jitter)

    w_h = jax.scipy.linalg.solve_triangular(
        L_s, y_h - C.T @ rf["w"], lower=True)
    alpha_h = jax.scipy.linalg.solve_triangular(
        L_s.T, w_h, lower=False)
    alpha_r = jax.scipy.linalg.solve_triangular(
        rf["L"].T, rf["w"] - C @ alpha_h, lower=False)
    return {"C": C, "L_s": L_s, "alpha_r": alpha_r, "alpha_h": alpha_h,
            "w_h": w_h, "mask_h": m_h}


@full_precision
def append_rows_update(rf, uf, Z_r, Z_h, z_new, y_new, pos,
                       hyp_ls, hyp_os, noise_diag, jitter, with_grad: bool,
                       refine: bool = False):
    """Rank-k append of ONE new conditioning point to a block factorization.

    The O(t²)-per-step path of iterative-conditioning rollouts (VERDICT #4;
    ref: benchmarking/simulate_forward_sampling_car.py:117-137): instead of
    refactorizing the whole hallucination Schur block each step (O(cap³)),
    extend the factor by the new point's k = Ty rows:

        C     ← [C, c],   c = L_r⁻¹ A_r,new                (R_r × k solve)
        L_s   ← [[L_s, 0], [bᵀ, D]],  b = L_s⁻¹(A_h,new − Cᵀc)
        D     = chol(A_new,new − cᵀc − bᵀb)                 (k × k)
        w_h   ← [w_h, D⁻¹(ỹ_new − cᵀw_r − bᵀw_h)]

    Empty buffer slots are identity rows of L_s with zero C/w_h/mask
    entries, so the triangular solves pass through them untouched and the
    result equals :func:`condition_update` of the filled buffer exactly
    (modulo jitter placement).

    Args:
        z_new: (1, D) new input point; y_new: (1, Ty) observation (NaN =
            masked task, e.g. value-only rollout observations).
        pos: row offset (filled_slots * Ty) where the new rows land; the
            caller guarantees pos + Ty <= capacity * Ty.
    Returns:
        updated {"C", "L_s", "w_h", "mask_h"} (alphas intentionally absent
        — predict with :func:`predict_from_w`).
    """
    Ty = y_new.shape[-1]
    grad = with_grad and Ty > 1
    y = y_new.reshape(-1)
    m_new = (~jnp.isnan(y)).astype(z_new.dtype)
    y = jnp.nan_to_num(y) * m_new
    m_r = rf["mask"]

    A_rn = m_r[:, None] * kernel_matrix(Z_r, z_new, hyp_ls, hyp_os, grad) \
        * m_new[None, :]
    A_hn = uf["mask_h"][:, None] \
        * kernel_matrix(Z_h, z_new, hyp_ls, hyp_os, grad) * m_new[None, :]
    K_nn = kernel_matrix(z_new, z_new, hyp_ls, hyp_os, grad) \
        + jnp.diag(noise_diag)
    A_nn = m_new[:, None] * K_nn * m_new[None, :] + jnp.diag(1.0 - m_new)

    solve = _tri_solve_refined if refine else (
        lambda L, B, lower: jax.scipy.linalg.solve_triangular(
            L, B, lower=lower))
    c = solve(rf["L"], A_rn, True)
    b = solve(uf["L_s"], A_hn - uf["C"].T @ c, True)          # (R_h, k)
    S = A_nn - c.T @ c - b.T @ b
    # The true Schur diagonal is a posterior variance + noise > 0, but f32
    # roundoff in the incremental c'c + b'b accumulation drives it negative
    # over long rollouts (unlike the full refactorization, errors compound
    # across appends).  Floor it RELATIVE to the prior variance; the
    # inflated sigma at near-deterministic points is bounded (~3e-3 of the
    # output scale in f32) and those samples are beta-clipped anyway.
    rel = 1e-5 if z_new.dtype == jnp.float32 else 1e-12
    di = jnp.diag_indices(Ty)
    S = S.at[di].set(jnp.maximum(S[di], rel * jnp.diagonal(A_nn)))
    D_blk = safe_cholesky(0.5 * (S + S.T), jitter)
    w_new = jax.scipy.linalg.solve_triangular(
        D_blk, y - c.T @ rf["w"] - b.T @ uf["w_h"], lower=True)

    # last-resort sanitizer: if the append still failed numerically, mask
    # the new rows (identity block, zero couplings) instead of poisoning
    # the whole realization with NaN for every later step
    ok = (jnp.all(jnp.isfinite(c)) & jnp.all(jnp.isfinite(b))
          & jnp.all(jnp.isfinite(D_blk)) & jnp.all(jnp.isfinite(w_new)))
    c = jnp.where(ok, c, 0.0)
    b = jnp.where(ok, b, 0.0)
    D_blk = jnp.where(ok, D_blk, jnp.eye(Ty, dtype=z_new.dtype))
    w_new = jnp.where(ok, w_new, 0.0)
    m_new = jnp.where(ok, m_new, 0.0)

    pos = jnp.asarray(pos)
    zero = jnp.zeros((), pos.dtype)
    C = jax.lax.dynamic_update_slice(uf["C"], c, (zero, pos))
    L_s = jax.lax.dynamic_update_slice(uf["L_s"], b.T, (pos, zero))
    L_s = jax.lax.dynamic_update_slice(L_s, D_blk, (pos, pos))
    w_h = jax.lax.dynamic_update_slice(uf["w_h"], w_new, (pos,))
    mask_h = jax.lax.dynamic_update_slice(uf["mask_h"], m_new, (pos,))
    return {"C": C, "L_s": L_s, "w_h": w_h, "mask_h": mask_h}


def _tri_solve_refined(L, B, lower: bool):
    """Triangular solve + one step of iterative refinement.

    An f32 solve against an ill-conditioned factor carries relative error
    ~eps*cond(L); one refinement step (residual has NO cancellation, so it
    is f32-accurate) brings the error back to ~eps independent of the
    condition number — cheap f64-grade accuracy for the posterior-variance
    subtraction Ktt - V'V, whose signal sits ~1e-6 below the prior scale
    on the fs workload (see sample_with_overrides prior_var notes).
    """
    x = jax.scipy.linalg.solve_triangular(L, B, lower=lower)
    r = B - (L @ x)
    return x + jax.scipy.linalg.solve_triangular(L, r, lower=lower)


@full_precision
def predict_from_w(Xt, Z_r, Z_h, rf, uf, hyp_ls, hyp_os, with_grad: bool,
                   refine: bool = False):
    """Joint posterior from the w-form block factorization.

    Same math as :func:`predict_update` but recovers the alphas from
    (w_r, w_h) by two capacity-sized back-substitutions — O(R²) per call,
    which keeps the incremental-append rollout free of any O(R³) work.

    ``refine=True`` applies one iterative-refinement step to every
    triangular solve: required in f32 when beta is large enough that the
    variance's cancellation noise (eps*cond-scale) becomes a real dynamics
    perturbation (the fs workload at beta=30; measured: refined f32
    matches the f64 variance to below the true-variance scale).
    """
    solve = _tri_solve_refined if refine else (
        lambda L, B, lower: jax.scipy.linalg.solve_triangular(
            L, B, lower=lower))
    alpha_h = solve(uf["L_s"].T, uf["w_h"], False)
    alpha_r = solve(rf["L"].T, rf["w"] - uf["C"] @ alpha_h, False)

    R_r = rf["mask"].shape[0]
    R_h = uf["mask_h"].shape[0]
    Kall = kernel_matrix(Xt, jnp.concatenate([Z_r, Z_h, Xt], axis=0),
                         hyp_ls, hyp_os, with_grad)
    Kx_r = Kall[:, :R_r] * rf["mask"][None, :]
    Kx_h = Kall[:, R_r:R_r + R_h] * uf["mask_h"][None, :]
    Ktt = Kall[:, R_r + R_h:]

    mean = Kx_r @ alpha_r + Kx_h @ alpha_h
    V_r = solve(rf["L"], Kx_r.T, True)
    V_h = solve(uf["L_s"], Kx_h.T - uf["C"].T @ V_r, True)
    cov = Ktt - V_r.T @ V_r - V_h.T @ V_h
    return mean, 0.5 * (cov + cov.T)


@full_precision
def predict_real(Xt, Z_r, rf, hyp_ls, hyp_os, with_grad: bool):
    """Joint posterior from the cached real-data w-form factor ONLY.

    The empty-hallucination fast path of SQP iteration 0: the buffer is
    reset at solve entry (ref: src/agent.py:261-272 rebuilds on real data
    at sqp_iter==0), so ``predict_update`` over identity-padded hall rows
    is pure overhead there.  mean = V' w and cov = Ktt - V'V share the one
    triangular solve V = L^-1 (K_xr ⊙ m)'.

    K_xr and K_tt come from ONE kernel evaluation against the
    concatenated points [Z_r; Xt]: the elementwise closed forms are
    identical either way, and at these shapes the stage is op-count
    bound, not FLOP bound (BENCH_NOTES GP-stage profiling).
    """
    R = rf["L"].shape[0]
    Kall = kernel_matrix(Xt, jnp.concatenate([Z_r, Xt], axis=0),
                         hyp_ls, hyp_os, with_grad)
    Kx = Kall[:, :R] * rf["mask"][None, :]
    Ktt = Kall[:, R:]
    V = jax.scipy.linalg.solve_triangular(rf["L"], Kx.T, lower=True)
    mean = V.T @ rf["w"]
    cov = Ktt - V.T @ V
    return mean, 0.5 * (cov + cov.T)


def predict_update(Xt, Z_r, Z_h, rf, uf, hyp_ls, hyp_os, jitter,
                   with_grad: bool):
    """Joint posterior using the block factorization.

    mean = Kx @ alpha; cov = Ktt - V_r'V_r - V_h'V_h with
    V_r = L_r^-1 (Kx_r ⊙ m_r)',  V_h = L_s^-1 ((Kx_h ⊙ m_h)' - C'V_r).

    All three kernel blocks come from ONE evaluation against the
    concatenated points [Z_r; Z_h; Xt] (op-count bound stage).
    """
    R_r = rf["mask"].shape[0]
    R_h = uf["mask_h"].shape[0]
    Kall = kernel_matrix(Xt, jnp.concatenate([Z_r, Z_h, Xt], axis=0),
                         hyp_ls, hyp_os, with_grad)
    Kx_r = Kall[:, :R_r] * rf["mask"][None, :]
    Kx_h = Kall[:, R_r:R_r + R_h] * uf["mask_h"][None, :]
    Ktt = Kall[:, R_r + R_h:]

    mean = Kx_r @ uf["alpha_r"] + Kx_h @ uf["alpha_h"]
    V_r = jax.scipy.linalg.solve_triangular(rf["L"], Kx_r.T, lower=True)
    V_h = jax.scipy.linalg.solve_triangular(
        uf["L_s"], Kx_h.T - uf["C"].T @ V_r, lower=True)
    cov = Ktt - V_r.T @ V_r - V_h.T @ V_h
    return mean, 0.5 * (cov + cov.T)
