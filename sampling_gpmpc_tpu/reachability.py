"""Forward-sampling reachability + dynamics-consistency rejection.

TPU-native equivalents of the reference's benchmarking layer and
rejection machinery:

* :func:`forward_sample_rollout` — propagate ns GP function realizations
  one step at a time under a fixed input trajectory, appending each step's
  sampled value back into its realization's conditioning set so the same
  function is consistently re-sampled (ref:
  benchmarking/simulate_forward_sampling_car.py:117-137,
  src/agent.py:283-329).  The whole rollout is one ``lax.scan``; the
  sample axis shards over a mesh (each realization is independent), which
  replaces the reference's 2500-job SLURM array
  (ref: benchmarking/euler_job.sh).

* :func:`reject_and_resample` — the dynamics-rejection step
  (ref: src/agent.py:331-443): realizations whose one-step-ahead predictions
  leave the c_i tube around the plan are discarded; their hallucinated
  datasets are replaced by datasets of surviving realizations.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from sampling_gpmpc_tpu import agent as agent_mod
from sampling_gpmpc_tpu.agent import GPState
from sampling_gpmpc_tpu.config import ProblemSpec
from sampling_gpmpc_tpu.envs.base import Env
from sampling_gpmpc_tpu.gp import exact
from sampling_gpmpc_tpu.gp.exact import GPHyperArrays
from sampling_gpmpc_tpu.setup import full_precision


def _sample_at_points_uf(spec: ProblemSpec, hyp: GPHyperArrays,
                         gp: GPState, uf, Xt, eps):
    """Jointly sample at per-sample points from a carried w-form factor.

    Args:
        uf: batched {"C","L_s","w_h","mask_h"} over (ns, g_ny).
        Xt: (ns, P, D) GP inputs (P points per sample).
        eps: (ns, g_ny, P, Ty) base draws.
    Returns:
        (ns, g_ny, P, Ty) sampled rows.
    """
    wg = spec.use_derivatives
    if hyp.min_data_dist >= 0.0:
        Z, Y = agent_mod.full_train_set(spec, gp)
    else:
        Z = jnp.zeros((spec.ns, spec.g_ny, 1, Xt.shape[-1]), Xt.dtype)
        Y = jnp.full((spec.ns, spec.g_ny, 1, spec.Ty), jnp.nan, Xt.dtype)

    def pred_one(Xt1, Zh1, rf1, uf1, ls, os_):
        # refine=True: f32 variance accuracy below the true-variance scale
        # (long beta=30 rollouts destabilize on the raw f32 noise floor)
        return exact.predict_from_w(Xt1, gp.real_Z, Zh1, rf1, uf1,
                                    ls, os_, wg, refine=True)

    mean, cov = jax.vmap(jax.vmap(pred_one, in_axes=(None, 0, 0, 0, 0, 0)),
                         in_axes=(0, 0, None, 0, None, None))(
        Xt, gp.hall_Z, gp.real_fact, uf, hyp.lengthscale, hyp.outputscale)

    pv = jax.vmap(lambda ls, os_: exact.prior_task_variances(
        ls, os_, spec.Ty))(hyp.lengthscale, hyp.outputscale)   # (g_ny, Ty)

    def samp_one(Xt1, Z1, Y1, mean1, cov1, eps1, pv1):
        return exact.sample_with_overrides(
            Xt1, Z1, Y1, None, mean1, cov1, eps1.reshape(-1), hyp, spec.Ty,
            prior_var=pv1)

    return jax.vmap(jax.vmap(samp_one, in_axes=(None, 0, 0, 0, 0, 0, 0)),
                    in_axes=(0, 0, 0, 0, 0, 0, None))(
        Xt, Z, Y, mean, cov, eps, pv)


def _propagate(spec: ProblemSpec, env: Env, x, u, dg):
    """Per-sample state update x+ = value column of the assembled jacobian.

    Args:
        x: (ns, nx); u: (ns, nu); dg: (ns, g_ny, 1, Ty).
    """
    xu = jnp.concatenate([x, u], axis=-1)
    comb = jax.vmap(env.assemble_val_jac)(xu, dg[:, :, 0, :])
    return comb[:, :, 0]


@full_precision
def forward_sample_rollout(spec: ProblemSpec, env: Env, hyp: GPHyperArrays,
                           gp: GPState, x0, U, key,
                           use_feedback: Optional[dict] = None,
                           eps=None):
    """Roll ns sampled dynamics under inputs U with iterative conditioning.

    Args:
        gp: GP state whose hallucination buffer has capacity >= len(U);
            typically ``init_gp_state(spec, env, dtype, capacity=T)``.
        x0: (nx,) or (ns, nx) initial state(s).
        U: (T, nu) input trajectory (the plan's inputs).
        key: PRNG key for the per-step epistemic draws.
        use_feedback: optional dict(K=..., x_eq=...) applying the ancillary
            feedback u_eff = U[t] - K(x_eq - x) per sample
            (ref: simulate_forward_sampling_car.py:122).
        eps: optional pre-drawn epistemic base draws (T, ns, g_ny, 1, Ty)
            replacing the per-step truncated-normal draws — the loadable
            epistemic vectors of the reference
            (ref: simulate_forward_sampling_car.py:78-80); also what makes
            dtype-envelope comparisons with SHARED draws possible.
    Returns:
        X_traj: (T+1, ns, nx) sampled trajectories; final GPState.

    The whole rollout traces under full-f32 matmul precision: bf16 passes
    in the per-step state/feedback algebra are chaotically amplified by
    marginally-stable dynamics realizations over long horizons (measured:
    bounded f64/f32 CPU rollouts vs 1e11 blowups on TPU defaults).
    """
    T = U.shape[0]
    dtype = U.dtype
    Ty = spec.Ty
    x_init = jnp.broadcast_to(jnp.asarray(x0, dtype), (spec.ns, spec.nx))
    keys = jax.random.split(key, T)

    # factor whatever is already in the buffer ONCE; each rollout step then
    # extends the factor by its one new point (rank-Ty append) instead of
    # refactorizing the whole capacity — O(t²) per step (VERDICT #4; ref:
    # simulate_forward_sampling_car.py:117-137 refits the GPyTorch model
    # per step)
    uf0 = {k: v for k, v in
           agent_mod.batched_update_factor(spec, hyp, gp).items()
           if k in ("C", "L_s", "w_h", "mask_h")}
    wg = spec.use_derivatives

    def append_factor(uf, gp, newZ, newY, pos):
        def app_one(rf1, uf1, Zh1, z1, y1, ls, os_):
            return exact.append_rows_update(
                rf1, uf1, gp.real_Z, Zh1, z1, y1, pos * Ty,
                ls, os_, hyp.noise_diag, hyp.jitter, wg, refine=True)

        return jax.vmap(jax.vmap(app_one, in_axes=(0, 0, 0, 0, 0, 0, 0)),
                        in_axes=(None, 0, 0, 0, 0, None, None))(
            gp.real_fact, uf, gp.hall_Z, newZ, newY,
            hyp.lengthscale, hyp.outputscale)

    def step(carry, inp):
        x, gp, uf = carry
        if eps is None:
            u_t, key_t = inp
        else:
            u_t, key_t, eps_t = inp
        u = jnp.broadcast_to(u_t[None], (spec.ns, spec.nu))
        if use_feedback is not None:
            K = jnp.asarray(use_feedback["K"], dtype)
            x_eq = jnp.asarray(use_feedback["x_eq"], dtype)
            u = u - (x_eq[None] - x) @ K.T
        xu = jnp.concatenate([x, u], axis=-1)
        Xt = xu[:, jnp.asarray(spec.g_idx_inputs)][:, None, :]  # (ns, 1, D)
        if eps is None:
            beta = spec.gp.beta
            eps_t = jax.random.truncated_normal(
                key_t, -beta, beta, (spec.ns, spec.g_ny, 1, Ty), dtype)
        dg = _sample_at_points_uf(spec, hyp, gp, uf, Xt, eps_t)
        x_next = _propagate(spec, env, x, u, dg)
        # append value-only observations (gradients NaN-masked, ref:
        # src/agent.py:402) to each realization's conditioning set
        newY = jnp.full_like(dg, jnp.nan)
        newY = newY.at[..., 0].set(dg[..., 0])
        newZ, newY = agent_mod.filter_near_duplicates(
            spec, hyp, Xt, newY,
            agent_mod.full_train_set(spec, gp)[0]
            if hyp.min_data_dist >= 0.0 else None)
        pos = gp.hall_n
        gp = agent_mod.append_hall_raw(gp, newZ, newY)
        uf = append_factor(uf, gp, newZ, newY, pos)
        return (x_next, gp, uf), x_next

    xs = (U, keys) if eps is None else (U, keys, jnp.asarray(eps, dtype))
    (x_fin, gp, _), X_tail = jax.lax.scan(step, (x_init, gp, uf0), xs)
    X_traj = jnp.concatenate([x_init[None], X_tail], axis=0)
    return X_traj, gp


def reject_and_resample(spec: ProblemSpec, env: Env, hyp: GPHyperArrays,
                        gp: GPState, X_plan, U_plan, x_next, ci, key,
                        var_eps: float, use_feedback: Optional[dict] = None):
    """Dynamics-consistency rejection after a closed-loop step.

    Forward-samples each realization from the measured next state along the
    remaining plan and rejects realizations whose predictions leave the
    per-stage tube  |x_pred_i - X_plan_{k+1}| < c_k  (ref:
    src/agent.py:331-443).  Rejected realizations get their hallucinated
    dataset replaced by that of a random surviving realization.

    Args:
        X_plan: (H+1, ns, nx) the solver's plan; U_plan: (H, nu).
        x_next: (nx,) measured state after applying u0.
        ci: (H,) tube radii; var_eps: stage-0 tube.
    Returns:
        updated GPState, number of surviving realizations.
    """
    H = spec.H
    dtype = X_plan.dtype

    # stage-1 check: plan's x_{1|k} vs measured x(k+1)
    diff0 = X_plan[1] - x_next[None]                     # (ns, nx)
    alive = jnp.all(jnp.abs(diff0) < var_eps, axis=-1)

    # forward-sample the realizations from x(k+1) under U[1:], on a
    # temporarily enlarged conditioning buffer (the FS data is discarded
    # afterwards, ref: src/agent.py:438-441 restores the SQP model)
    extraZ = jnp.full(gp.hall_Z.shape[:2] + (H, gp.hall_Z.shape[3]),
                      agent_mod.FAR, dtype)
    extraY = jnp.full(gp.hall_Y.shape[:2] + (H, gp.hall_Y.shape[3]),
                      jnp.nan, dtype)
    gp_fs = gp._replace(hall_Z=jnp.concatenate([gp.hall_Z, extraZ], axis=2),
                        hall_Y=jnp.concatenate([gp.hall_Y, extraY], axis=2))
    X_traj, _ = forward_sample_rollout(
        spec, env, hyp, gp_fs, x_next, U_plan[1:], key,
        use_feedback=use_feedback)

    # tube checks against the plan's stages 2..H: X_traj[i] is the
    # realization's prediction of stage i+1, whose tube radius is ci[i]
    # (ci[k-1] is stage k's radius; ref: src/agent.py:362-396).  One
    # vectorized comparison over all H-1 stages — no Python-range unroll.
    diff = X_plan[2:H + 1] - X_traj[1:H]                 # (H-1, ns, nx)
    radii = jnp.asarray(ci, dtype)[1:H, None, None]
    alive = alive & jnp.all(jnp.abs(diff) < radii, axis=(0, 2))

    n_alive = jnp.sum(alive)

    # resample rejected realizations' datasets from the survivors; when
    # nothing survives the data stays untouched (ref: src/agent.py:418)
    probs = jnp.where(alive, 1.0, 0.0)
    probs = probs / jnp.maximum(n_alive, 1)
    donors = jax.random.choice(jax.random.fold_in(key, 1), spec.ns,
                               (spec.ns,), p=probs)
    keep = alive | (n_alive == 0)
    src = jnp.where(keep, jnp.arange(spec.ns), donors)
    gp = gp._replace(hall_Z=gp.hall_Z[src], hall_Y=gp.hall_Y[src])
    return gp, n_alive
