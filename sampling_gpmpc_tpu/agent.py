"""Sampling engine: epistemic draws, batched GP state, dynamics jacobians.

Functional counterpart of the reference Agent (ref: src/agent.py:18-730).
All GP state lives in explicit pytrees with static shapes:

* real training data, tiled over ``(ns, g_ny)``,
* a "hallucinated" append buffer of capacity ``H * max_sqp_iter`` whose
  empty slots sit at a far-away input (FAR) with NaN observations, so the
  masked conditioning of gp/exact.py ignores them — the static-shape
  equivalent of the reference's growing ``torch.cat`` dataset
  (ref: src/agent.py:164-202,261-272).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sampling_gpmpc_tpu.config import ProblemSpec
from sampling_gpmpc_tpu.envs.base import Env
from sampling_gpmpc_tpu.gp import exact
from sampling_gpmpc_tpu.gp.exact import GPHyperArrays

FAR = 1.0e5   # input coordinate of empty hallucination slots


class GPState(NamedTuple):
    """All conditioning data for the batched GP.

    The real training data never changes over an experiment, so its masked
    Cholesky factor is computed once (per output) at init; per-SQP-iteration
    conditioning only appends the hallucination block via a blockwise
    Cholesky update (gp/exact.py condition_update) — replacing the
    reference's full model rebuild each iteration (ref: src/agent.py:216-272).
    """

    real_Z: jnp.ndarray    # (N, D)
    real_Y: jnp.ndarray    # (g_ny, N, Ty)
    real_fact: dict        # per-output {"L" (g_ny,R,R), "w" (g_ny,R), "mask"}
    hall_Z: jnp.ndarray    # (ns, g_ny, Mh, D)
    hall_Y: jnp.ndarray    # (ns, g_ny, Mh, Ty)  (NaN = empty/masked)
    hall_n: jnp.ndarray    # scalar int32 fill count


def init_gp_state(spec: ProblemSpec, env: Env, dtype, capacity: int = None,
                  hyp: GPHyperArrays = None) -> GPState:
    X, Y = env.training_grid()
    Y = Y[:, :, :spec.Ty]
    Mh = capacity if capacity is not None else spec.H * max(spec.max_sqp_iter, 1)
    D = spec.n_gp_inputs
    real_Z = jnp.asarray(X, dtype)
    real_Y = jnp.asarray(Y, dtype)
    if hyp is None:
        hyp = GPHyperArrays.from_spec(spec.gp, dtype)
    rf = jax.jit(jax.vmap(
        lambda Y1, ls, os_: exact.factor_real(
            real_Z, Y1, ls, os_, hyp.noise_diag, hyp.jitter,
            spec.use_derivatives)))(real_Y, hyp.lengthscale, hyp.outputscale)
    return GPState(
        real_Z=real_Z,
        real_Y=real_Y,
        real_fact=rf,
        hall_Z=jnp.full((spec.ns, spec.g_ny, Mh, D), FAR, dtype),
        hall_Y=jnp.full((spec.ns, spec.g_ny, Mh, spec.Ty), jnp.nan, dtype),
        hall_n=jnp.asarray(0, jnp.int32),
    )


def reset_hall(gp: GPState) -> GPState:
    return gp._replace(
        hall_Z=jnp.full_like(gp.hall_Z, FAR),
        hall_Y=jnp.full_like(gp.hall_Y, jnp.nan),
        hall_n=jnp.zeros_like(gp.hall_n),
    )


def full_train_set(spec: ProblemSpec, gp: GPState):
    """(ns, g_ny, M, D), (ns, g_ny, M, Ty) concatenated real+hallucinated."""
    Z = jnp.broadcast_to(gp.real_Z[None, None],
                         (spec.ns, spec.g_ny) + gp.real_Z.shape)
    Y = jnp.broadcast_to(gp.real_Y[None], (spec.ns,) + gp.real_Y.shape)
    return (jnp.concatenate([Z, gp.hall_Z], axis=2),
            jnp.concatenate([Y, gp.hall_Y], axis=2))


def make_epistemic(key, spec: ProblemSpec, dtype) -> jnp.ndarray:
    """Pre-drawn truncated-normal base samples for every (mpc, sqp) iteration.

    The reference rejection-samples whole blocks until all entries lie in
    [-beta, beta] (ref: src/agent.py:76-104); for iid entries that equals a
    per-entry truncated normal, which we draw directly.
    """
    beta = spec.gp.beta
    shape = (spec.num_mpc_iter, spec.max_sqp_iter, spec.ns, spec.g_ny,
             spec.H, spec.Ty)
    return jax.random.truncated_normal(key, -beta, beta, shape, dtype)


def _batched_posterior(spec: ProblemSpec, hyp: GPHyperArrays, Z, Y, Xt):
    """Condition + predict from scratch, vmapped over (ns, g_ny).

    Args:
        Z: (ns, g_ny, M, D); Y: (ns, g_ny, M, Ty); Xt: (ns, H, D).
    Returns:
        fact pytree, mean (ns, g_ny, Ht), cov (ns, g_ny, Ht, Ht).
    """
    wg = spec.use_derivatives

    def cond_one(Z1, Y1, ls, os_):
        return exact.condition(Z1, Y1, ls, os_, hyp.noise_diag, hyp.jitter, wg)

    fact = jax.vmap(jax.vmap(cond_one, in_axes=(0, 0, 0, 0)),
                    in_axes=(0, 0, None, None))(
        Z, Y, hyp.lengthscale, hyp.outputscale)

    def pred_one(Xt1, Z1, f1, ls, os_):
        return exact.predict(Xt1, Z1, f1, ls, os_, hyp.jitter, wg)

    mean, cov = jax.vmap(jax.vmap(pred_one, in_axes=(None, 0, 0, 0, 0)),
                         in_axes=(0, 0, 0, None, None))(
        Xt, Z, fact, hyp.lengthscale, hyp.outputscale)
    return fact, mean, cov


def batched_update_factor(spec: ProblemSpec, hyp: GPHyperArrays,
                          gp: GPState):
    """Blockwise-update factorization of the hallucination buffer, vmapped
    over (ns, g_ny).  One O(cap³) Schur factorization — rollouts extend the
    result per step with exact.append_rows_update instead of re-running it.
    """
    wg = spec.use_derivatives

    def upd_one(rf1, Zh1, Yh1, ls, os_):
        return exact.condition_update(
            rf1, gp.real_Z, Zh1, Yh1, ls, os_, hyp.noise_diag, hyp.jitter, wg)

    return jax.vmap(jax.vmap(upd_one, in_axes=(0, 0, 0, 0, 0)),
                    in_axes=(None, 0, 0, None, None))(
        gp.real_fact, gp.hall_Z, gp.hall_Y,
        hyp.lengthscale, hyp.outputscale)


def _batched_posterior_incremental(spec: ProblemSpec, hyp: GPHyperArrays,
                                   gp: GPState, Xt):
    """Condition + predict via the blockwise update on the cached real
    factorization: only the (R_h, R_h) Schur block is factorized per
    (sample, output) — the hot path of every SQP iteration.

    Returns:
        mean (ns, g_ny, Ht), cov (ns, g_ny, Ht, Ht).
    """
    wg = spec.use_derivatives
    uf = batched_update_factor(spec, hyp, gp)

    def pred_one(Xt1, Zh1, rf1, uf1, ls, os_):
        return exact.predict_update(Xt1, gp.real_Z, Zh1, rf1, uf1, ls, os_,
                                    hyp.jitter, wg)

    mean, cov = jax.vmap(jax.vmap(pred_one, in_axes=(None, 0, 0, 0, 0, 0)),
                         in_axes=(0, 0, None, 0, None, None))(
        Xt, gp.hall_Z, gp.real_fact, uf, hyp.lengthscale, hyp.outputscale)
    return mean, cov


def _batched_posterior_real(spec: ProblemSpec, hyp: GPHyperArrays,
                            gp: GPState, Xt):
    """Posterior from the cached real factor only (empty hall buffer)."""
    wg = spec.use_derivatives

    def pred_one(Xt1, rf1, ls, os_):
        return exact.predict_real(Xt1, gp.real_Z, rf1, ls, os_, wg)

    return jax.vmap(jax.vmap(pred_one, in_axes=(None, 0, 0, 0)),
                    in_axes=(0, None, None, None))(
        Xt, gp.real_fact, hyp.lengthscale, hyp.outputscale)


def _fused_sample_empty(spec: ProblemSpec, hyp: GPHyperArrays, gp: GPState,
                        Xt, eps, md=None):
    """Empty-hall GP stage via the fused Pallas kernel (ops/pallas_gp.py).

    XLA evaluates the kernel blocks (a handful of well-fused elementwise
    ops); the kernel runs mask, posterior, batched Cholesky, pathwise
    draw and the override tail in one launch per output.
    """
    from sampling_gpmpc_tpu.gp.kernel import kernel_matrix
    from sampling_gpmpc_tpu.ops import pallas_gp

    wg = spec.use_derivatives
    H, Ty = spec.H, spec.Ty
    R = gp.real_fact["mask"].shape[-1]
    j0 = max(hyp.jitter, 1e-6)   # safe_cholesky's f32 first-attempt floor
    dgs = []
    for j in range(spec.g_ny):
        ls = hyp.lengthscale[j]
        os_ = hyp.outputscale[j]
        Kall = jax.vmap(lambda Xt1, ls=ls, os_=os_: kernel_matrix(
            Xt1, jnp.concatenate([gp.real_Z, Xt1], axis=0), ls, os_, wg))(Xt)
        Kxm = Kall[..., :R] * gp.real_fact["mask"][j][None, None, :]
        Ktt = Kall[..., R:]
        pv = exact.prior_task_variances(ls, os_, Ty)
        dg_j = pallas_gp.sample_empty_one(
            Kxm, Ktt, eps[:, j].reshape(spec.ns, H * Ty),
            gp.real_fact["Linv"][j], gp.real_fact["alpha"][j],
            jnp.tile(pv, H), j0, hyp.beta, hyp.variance_is_zero, 1e-5,
            ty=Ty, close=None if md is None else md[0][:, j],
            ynear=None if md is None else md[1][:, j])
        dgs.append(dg_j.reshape(spec.ns, H, Ty))
    return jnp.stack(dgs, axis=1)                       # (ns, g_ny, H, Ty)


def _fused_sample_hall(spec: ProblemSpec, hyp: GPHyperArrays, gp: GPState,
                       Xt, eps, md=None):
    """Hall-block GP stage via the fused Pallas kernel (iterations >= 1).

    XLA evaluates the kernel-matrix blocks and masks (a few large fused
    elementwise ops); the kernel runs the block-Cholesky pieces, the
    batched Schur factorization, the per-sample substitutions, the
    covariance Cholesky, the pathwise draw and the override tail in one
    launch per output (ops/pallas_gp.py::_hall_kernel) — replacing the
    ~70-op XLA chain measured at 8.6 ms of the 26 ms car SQP step
    (profiling/car_stage_probe.py; ref role: src/GP_model.py:50-91 +
    src/agent.py:216-272 rebuild-and-sample each SQP iteration).
    """
    from sampling_gpmpc_tpu.gp.kernel import kernel_matrix
    from sampling_gpmpc_tpu.ops import pallas_gp

    wg = spec.use_derivatives
    H, Ty = spec.H, spec.Ty
    Rr = gp.real_fact["mask"].shape[-1]
    Mh = gp.hall_Z.shape[2]
    Rh = Mh * Ty
    j0 = max(hyp.jitter, 1e-6)
    eyeRh = jnp.eye(Rh, dtype=Xt.dtype)
    noise_tile = jnp.tile(hyp.noise_diag, Mh)
    dgs = []
    for j in range(spec.g_ny):
        ls = hyp.lengthscale[j]
        os_ = hyp.outputscale[j]
        m_r = gp.real_fact["mask"][j]
        Zh = gp.hall_Z[:, j]                           # (ns, Mh, D)
        yh_flat = gp.hall_Y[:, j].reshape(spec.ns, Rh)
        m_h = (~jnp.isnan(yh_flat)).astype(Xt.dtype)
        yh = jnp.nan_to_num(yh_flat) * m_h
        ev1 = jax.vmap(lambda Zh1, ls=ls, os_=os_: kernel_matrix(
            jnp.concatenate([gp.real_Z, Zh1], axis=0), Zh1, ls, os_, wg))(Zh)
        Arh = ev1[:, :Rr] * m_r[None, :, None] * m_h[:, None, :]
        Khh = ev1[:, Rr:] + jnp.diag(noise_tile)[None]
        Ahh = (m_h[:, :, None] * Khh * m_h[:, None, :]
               + eyeRh[None] * (1.0 - m_h)[:, None, :])
        ev2 = jax.vmap(lambda Xt1, Zh1, ls=ls, os_=os_: kernel_matrix(
            Xt1, jnp.concatenate([gp.real_Z, Zh1, Xt1], axis=0),
            ls, os_, wg))(Xt, Zh)
        Kxr = ev2[..., :Rr] * m_r[None, None, :]
        Kxh = ev2[..., Rr:Rr + Rh] * m_h[:, None, :]
        Ktt = ev2[..., Rr + Rh:]
        pv = exact.prior_task_variances(ls, os_, Ty)
        dg_j = pallas_gp.sample_hall_one(
            gp.hall_n * Ty, Kxr, Kxh, Ktt, Arh, Ahh, yh,
            eps[:, j].reshape(spec.ns, H * Ty),
            gp.real_fact["Linv"][j], gp.real_fact["w"][j],
            jnp.tile(pv, H), j0, hyp.beta, hyp.variance_is_zero, 1e-5,
            ty=Ty, close=None if md is None else md[0][:, j],
            ynear=None if md is None else md[1][:, j])
        dgs.append(dg_j.reshape(spec.ns, H, Ty))
    return jnp.stack(dgs, axis=1)                       # (ns, g_ny, H, Ty)


def sample_dynamics(spec: ProblemSpec, env: Env, hyp: GPHyperArrays,
                    gp: GPState, Xt: jnp.ndarray, eps: jnp.ndarray,
                    axis_name=None,
                    hall_empty: bool = False) -> Tuple[jnp.ndarray, GPState]:
    """One SQP iteration's GP function-sample draw + hallucination append.

    Mirrors get_batch_gp_sensitivities (ref: src/agent.py:566-627): the
    debug overrides (true dynamics / posterior mean as sample) replace GP
    draws for the first sample indices; pure-oracle modes skip conditioning
    entirely.

    Args:
        Xt: (ns, H, D) GP inputs along the current iterate.
        eps: (ns, g_ny, H, Ty) epistemic base draws for this iteration.
    Returns:
        dg: (ns, g_ny, H, Ty) sampled values(+gradients); updated GPState.
    """
    H, Ty = spec.H, spec.Ty
    oracle_only = (
        (spec.true_dyn_as_sample or spec.mean_as_dyn_sample) and spec.ns == 1
    ) or (spec.true_dyn_as_sample and spec.mean_as_dyn_sample and spec.ns == 2)

    def true_rows(Xt_one):
        rows = jax.vmap(env.g_prior)(Xt_one)          # (H, g_ny, 1+D)
        return jnp.swapaxes(rows, 0, 1)[..., :Ty]     # (g_ny, H, Ty)

    if oracle_only and not spec.mean_as_dyn_sample:
        # pure true-dynamics oracle (ns=1): no GP work at all
        return true_rows(Xt[0])[None], gp

    # posterior via the blockwise update on the cached real factorization;
    # the concatenated train set is only needed by the (statically gated)
    # min-dist override and the dedup filter
    need_train_set = hyp.min_data_dist >= 0.0
    if need_train_set:
        Z, Y = full_train_set(spec, gp)
        # ||Xt - Z|| once: shared by the min-dist sample override and the
        # hallucination dedup filter (identical matrix, op-count savings)
        dist = jnp.linalg.norm(
            Xt[:, None, :, None, :] - Z[:, :, None, :, :], axis=-1)
    else:
        Z = jnp.zeros((spec.ns, spec.g_ny, 1, Xt.shape[-1]), Xt.dtype)
        Y = jnp.full((spec.ns, spec.g_ny, 1, Ty), jnp.nan, Xt.dtype)
        dist = None
    from sampling_gpmpc_tpu.ops import pallas_gp
    use_fused = (hall_empty and not oracle_only
                 and "Linv" in gp.real_fact
                 and pallas_gp.fused_ok(spec, hyp, Xt.dtype, spec.ns,
                                        H * Ty,
                                        gp.real_fact["mask"].shape[-1]))
    use_fused_hall = (not hall_empty and not oracle_only
                      and "Linv" in gp.real_fact
                      and pallas_gp.fused_hall_ok(
                          spec, hyp, Xt.dtype, spec.ns, H * Ty,
                          gp.real_fact["mask"].shape[-1],
                          gp.hall_Z.shape[2] * Ty))
    if use_fused or use_fused_hall:
        # fused TPU path: no (mean, cov) materialization — the gate
        # excludes its only remaining consumer (mean_as_dyn_sample).
        # The min-dist override's mask + nearest-train-row replacement
        # are precomputed here from the SAME distance matrix the dedup
        # filter uses and applied inside the kernel
        md = None
        if need_train_set:
            row_invalid = jnp.any(jnp.isnan(Y), axis=-1)   # (ns,g_ny,M)
            dmask = jnp.where(row_invalid[:, :, None, :], jnp.inf, dist)
            clo = jnp.any(dmask <= hyp.min_data_dist, axis=-1)
            nearest = jnp.argmin(dmask, axis=-1)           # (ns,g_ny,H)
            ynear = jnp.take_along_axis(
                Y, nearest[..., None], axis=2)             # (ns,g_ny,H,Ty)
            sh = (spec.ns, spec.g_ny, H * Ty)
            md = (jnp.broadcast_to(clo[..., None],
                                   clo.shape + (Ty,)).reshape(sh)
                  .astype(Xt.dtype),
                  ynear.reshape(sh))
    if use_fused:
        dg = _fused_sample_empty(spec, hyp, gp, Xt, eps, md=md)
    elif use_fused_hall:
        # fused TPU path for SQP iterations >= 1 (hall block conditioned)
        use_fused = True
        dg = _fused_sample_hall(spec, hyp, gp, Xt, eps, md=md)
    elif hall_empty:
        # SQP iteration 0: buffer reset at solve entry — skip the whole
        # hall-block machinery (statically; see sqp.solve's peeled step)
        mean, cov = _batched_posterior_real(spec, hyp, gp, Xt)
    else:
        mean, cov = _batched_posterior_incremental(spec, hyp, gp, Xt)

    if oracle_only:
        dg = jnp.zeros((spec.ns, spec.g_ny, H, Ty), Xt.dtype)
    elif not use_fused:
        pv = jax.vmap(lambda ls, os_: exact.prior_task_variances(
            ls, os_, Ty))(hyp.lengthscale, hyp.outputscale)   # (g_ny, Ty)

        def samp_one(Xt1, Z1, Y1, mean1, cov1, eps1, pv1, dist1):
            return exact.sample_with_overrides(
                Xt1, Z1, Y1, None, mean1, cov1, eps1.reshape(-1), hyp, Ty,
                prior_var=pv1, dist=dist1)

        dg = jax.vmap(jax.vmap(samp_one, in_axes=(None, 0, 0, 0, 0, 0, 0, 0)),
                      in_axes=(0, 0, 0, 0, 0, 0, None,
                               0 if dist is not None else None))(
            Xt, Z, Y, mean, cov, eps, pv, dist)      # (ns, g_ny, H, Ty)

    # debug overrides address *global* sample indices 0 (and 1); under
    # shard_map these live on shard 0, so mask by the global index
    offset = (jax.lax.axis_index(axis_name) * spec.ns
              if axis_name is not None else 0)
    gidx = offset + jnp.arange(spec.ns)
    idx = 0
    if spec.true_dyn_as_sample:
        dg = jnp.where((gidx == idx)[:, None, None, None],
                       true_rows(Xt[0])[None], dg)
        idx += 1
    if spec.mean_as_dyn_sample:
        dg = jnp.where((gidx == idx)[:, None, None, None],
                       mean[min(idx, spec.ns - 1)].reshape(
                           spec.g_ny, H, Ty)[None], dg)
        idx += 1

    # the append feeds the NEXT iteration's conditioning AND the
    # post-solve GP state (debug probes, recorder, buffer invariants) —
    # keep it even in RTI mode where no further iteration consumes it
    if not oracle_only:
        gp = append_hall(spec, hyp, gp, Xt, dg,
                         Z if need_train_set else None, dist=dist)
    return dg, gp


def filter_near_duplicates(spec: ProblemSpec, hyp: GPHyperArrays,
                           Xt, dg, Z_full, dist=None):
    """NaN-mask observations at near-duplicate new points.

    Near-duplicate new points (within min_data_dist of any existing
    conditioning point) get NaN observations so they are masked out —
    the static-shape version of the reference's filter
    (ref: src/agent.py:164-202).

    Args:
        dist: optional precomputed (ns, g_ny, P, M) ||Xt - Z_full|| matrix
            (shared with the sampling min-dist override).
    Returns (newZ, newY) shaped (ns, g_ny, P, ...).
    """
    newZ = jnp.broadcast_to(Xt[:, None], (spec.ns, spec.g_ny) + Xt.shape[1:])
    newY = dg
    if hyp.min_data_dist >= 0.0:
        if dist is None:
            dist = jnp.linalg.norm(
                newZ[:, :, :, None, :] - Z_full[:, :, None, :, :], axis=-1)
        too_close = jnp.any(dist <= hyp.min_data_dist, axis=-1)  # (ns,g_ny,P)
        newY = jnp.where(too_close[..., None], jnp.nan, newY)
    return newZ, newY


def append_hall_raw(gp: GPState, newZ, newY) -> GPState:
    """Write pre-filtered rows into the hallucination buffer at hall_n."""
    zero = jnp.zeros((), gp.hall_n.dtype)
    hall_Z = jax.lax.dynamic_update_slice(
        gp.hall_Z, newZ, (zero, zero, gp.hall_n, zero))
    hall_Y = jax.lax.dynamic_update_slice(
        gp.hall_Y, newY, (zero, zero, gp.hall_n, zero))
    return gp._replace(hall_Z=hall_Z, hall_Y=hall_Y,
                       hall_n=gp.hall_n + newZ.shape[2])


def append_hall(spec: ProblemSpec, hyp: GPHyperArrays, gp: GPState,
                Xt, dg, Z_full, dist=None) -> GPState:
    """Append this iteration's samples to the hallucination buffer."""
    newZ, newY = filter_near_duplicates(spec, hyp, Xt, dg, Z_full, dist=dist)
    return append_hall_raw(gp, newZ, newY)


def posterior_value_moments(spec: ProblemSpec, hyp: GPHyperArrays,
                            gp: GPState, Xt: jnp.ndarray):
    """Posterior VALUE mean/stddev along an iterate, for per-SQP-iterate
    debug plots (ref: src/solver.py:247-287 plots mean +/- 2 sqrt(var) of
    each sample's conditioned model).  Runs on the gp state as it ENTERS
    the iteration — the model each function-sample is drawn from.

    Args:
        Xt: (ns, H, D) GP inputs along the current iterate.
    Returns:
        mean, std: (ns, g_ny, H) value-column posterior moments.
    """
    mean, cov = _batched_posterior_incremental(spec, hyp, gp, Xt)
    H, Ty = Xt.shape[1], spec.Ty
    var = jnp.diagonal(cov, axis1=-2, axis2=-1)
    mean_v = mean.reshape(spec.ns, spec.g_ny, H, Ty)[..., 0]
    std_v = jnp.sqrt(jnp.clip(var.reshape(spec.ns, spec.g_ny, H, Ty)[..., 0],
                              0.0))
    return mean_v, std_v


def dyn_linearization(spec: ProblemSpec, env: Env, xu: jnp.ndarray,
                      dg: jnp.ndarray, K_fb):
    """Assemble per-sample per-stage (value, A, B) from sampled dynamics.

    Mirrors dyn_fg_jacobians + the feedback chain rule A <- A + B K
    (ref: src/agent.py:532-564, src/solver.py:86-90).

    Args:
        xu: (ns, H, nx+nu) linearization points (with realized inputs).
        dg: (ns, g_ny, H, Ty) sampled GP rows.
    Returns:
        val (ns, H, nx), A (ns, H, nx, nx), B (ns, H, nx, nu).
    """
    dg_kh = jnp.swapaxes(dg, 1, 2)          # (ns, H, g_ny, Ty)
    combined = jax.vmap(jax.vmap(env.assemble_val_jac))(xu, dg_kh)
    val = combined[..., 0]
    A = combined[..., 1:1 + spec.nx]
    B = combined[..., 1 + spec.nx:]
    if spec.use_feedback:
        A = A + B @ jnp.asarray(K_fb, B.dtype)
    return val, A, B
