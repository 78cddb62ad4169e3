"""SQP-RTI solve loop over the augmented sampled-dynamics OCP.

Jitted replacement for the reference's DEMPC_solver.solve
(ref: src/solver.py:39-156).  Each iteration:

  1. convergence check on the relative iterate change (ref: solver.py:66-81),
  2. GP condition + function-sample along the iterate (agent.sample_dynamics,
     resetting the hallucination buffer at iteration 0 — ref: agent.py:261-272),
  3. per-sample affine linearization (A, B, value) with the ancillary
     feedback chain rule,
  4. condensing onto dU, QP assembly, dense PDIP solve,
  5. delta-iterate update.

The whole loop runs under ``lax.while_loop`` so one MPC step is a single
XLA computation; the convergence predicate mirrors SQP-RTI semantics (one
QP per iteration, Levenberg-Marquardt damped).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sampling_gpmpc_tpu import agent as agent_mod
from sampling_gpmpc_tpu.agent import GPState
from sampling_gpmpc_tpu.config import ProblemSpec
from sampling_gpmpc_tpu.envs.base import Env
from sampling_gpmpc_tpu.gp.exact import GPHyperArrays
from sampling_gpmpc_tpu.ocp.assemble import (build_cost, build_hard_rows,
                                             build_soft_rows, row_counts)
from sampling_gpmpc_tpu.ocp.condense import condense_parallel as condense
from sampling_gpmpc_tpu.ocp.qp import boxes_to_rows, solve_qp_soft
from sampling_gpmpc_tpu.ocp.spec import OCPData
from sampling_gpmpc_tpu.parallel.collectives import make_reducers


class SolveState(NamedTuple):
    X: jnp.ndarray        # (H+1, ns, nx) current iterate
    U: jnp.ndarray        # (H, nu)
    X_prev: jnp.ndarray
    U_prev: jnp.ndarray
    gp: GPState
    it: jnp.ndarray       # sqp iteration counter
    status: jnp.ndarray   # 0 ok
    done: jnp.ndarray     # convergence flag
    qp_ws: tuple          # PDIP warm-start state (ref: src/utils/ocp.py:310)
    qp_valid: jnp.ndarray  # bool: qp_ws holds a usable previous solution
    qp_iters: jnp.ndarray  # cumulative PDIP iterations (diagnostics)
    qp_gap: jnp.ndarray    # last QP's best KKT residual (diagnostics)
    best_step: jnp.ndarray  # scalar: min raw relative step seen this solve
    stall_count: jnp.ndarray  # int32: consecutive iters with no new minimum
    mono_count: jnp.ndarray  # int32: consecutive iters WITH a new minimum
    alpha: jnp.ndarray      # step under-relaxation factor (1.0 = pure RTI)


# consecutive iterations without a meaningful new raw-step-norm minimum
# before under-relaxation engages.  A converging SQP makes a new minimum
# every few iterations; a limit cycle of ANY period (car_residual's is
# period-4 at stock LM, so direction-reversal probes miss it) never does.
# 6 exceeds the max_sqp_iter of every golden closed-loop SEMPC config
# except params_car_residual (150), so those goldens keep exact full-step
# reference semantics bitwise.
STALL_WINDOW = 6
# a new minimum must shrink by 5% to count as progress (plateau = stall)
STALL_SHRINK = 0.95
# consecutive strict new minima before alpha recovers x2 (cap 1.0): once
# the cycle is broken the iteration enters a pure creep phase (cos between
# successive raw steps = +1.000 measured) whose rate is set by the LM
# damping, not alpha — recovering to full steps doubles the creep rate; if
# the cycle re-fires, the stall gate re-engages.  In the creep phase every
# iteration makes a new minimum; in a cycle almost none do.
RECOVER_WINDOW = 4
MIN_ALPHA = 1.0 / 16.0


def consume_step(spec: ProblemSpec, X_it, U_it, X_cand, U_cand, ok,
                 best_step, stall_count, mono_count, alpha, axis_name=None,
                 ordered: bool = False):
    """Shared post-QP step consumption for ``solve`` and ``solve_recorded``.

    One function so the driving loop and its host-stepped debug twin cannot
    drift apart.  Three pieces:

    * failed-QP revert — a failed QP's step is NOT consumed
      (ref: src/solver.py:146-151 breaks before fetching the iterate);
    * stall-gated under-relaxation: pure SQP-RTI (full steps, the
      reference's fixed-step globalization) can enter a limit cycle
      between active sets (measured: params_car_residual at stock LM=30
      settles into a period-4 cycle with x_diff 6e-5..2.1e-4 > tol,
      flip-flopping the late-stage acceleration/v-bound active set).
      When the raw relative step norm makes no new minimum for
      STALL_WINDOW consecutive iterations, the applied step is halved
      (floor MIN_ALPHA) and the window restarts; after RECOVER_WINDOW
      consecutive strict new minima (the post-cycle creep phase) alpha
      doubles back toward 1.  At alpha=1 the update is bit-identical to
      the reference semantics, so the rule only engages where fixed-step
      RTI does not converge anyway — and a damped fixed point satisfies
      d(x*)=0, the same first-order conditions;
    * the relative-change convergence predicate on the RAW candidate step
      (ref: src/solver.py:66-81) — measuring the raw step keeps the test
      meaningful under damping (an alpha-scaled small movement of a large
      raw step must not read as convergence).

    Returns (X, U, x_diff, u_diff, done, best_step, stall_count,
    mono_count, alpha).
    """
    dX = X_cand - X_it
    dU = U_cand - U_it

    psum, _, _ = make_reducers(axis_name, ordered)

    def _norm(a):
        return jnp.sqrt(psum(jnp.sum(a * a)))

    x_diff = _norm(dX[:spec.H]) / (_norm(X_it[:spec.H]) + 1e-6)
    u_diff = jnp.linalg.norm(dU) / (jnp.linalg.norm(U_it) + 1e-6)
    sn = x_diff + u_diff
    improved = sn < STALL_SHRINK * best_step
    count = jnp.where(improved, 0, stall_count + 1)
    # a strict-but-small new minimum is the slow-creep phase, not a cycle:
    # it blocks engagement (damping a creeping step only slows the creep)
    engage = (count >= STALL_WINDOW) & (sn >= best_step)
    mono = jnp.where(sn < best_step, mono_count + 1, 0)
    recover = (~engage) & (mono >= RECOVER_WINDOW) & (alpha < 1.0)
    alpha_new = jnp.where(
        engage, jnp.maximum(alpha * 0.5, MIN_ALPHA),
        jnp.where(recover, jnp.minimum(alpha * 2.0, 1.0), alpha))
    count = jnp.where(engage, 0, count)
    mono = jnp.where(engage | recover, 0, mono)
    # at alpha=1 take the candidate BITWISE (X_it + 1.0*dX differs from
    # X_cand in the last ulp, enough to decohere the chaotic golden loops)
    full = alpha_new == 1.0
    X = jnp.where(ok, jnp.where(full, X_cand, X_it + alpha_new * dX), X_it)
    U = jnp.where(ok, jnp.where(full, U_cand, U_it + alpha_new * dU), U_it)
    best_step = jnp.where(ok, jnp.minimum(best_step, sn), best_step)
    stall_count = jnp.where(ok, count, stall_count)
    mono_count = jnp.where(ok, mono, mono_count)
    alpha = jnp.where(ok, alpha_new, alpha)
    done = (x_diff < spec.tol_nlp) & (u_diff < spec.tol_nlp)
    return (X, U, x_diff, u_diff, done, best_step, stall_count,
            mono_count, alpha)


def init_qp_ws(spec: ProblemSpec, dtype):
    """Placeholder warm-start state (selected away while qp_valid=False)."""
    m_h, m_s = row_counts(spec)
    nU = spec.H * spec.nu
    z = lambda n: jnp.ones((n,), dtype)
    return (jnp.zeros((nU,), dtype), z(m_s), z(m_s), z(m_h), z(m_h),
            z(m_s), z(m_s), z(m_s), z(m_s), z(m_s), z(m_s))


def init_iterate(spec: ProblemSpec, dtype, start=None):
    """Initial iterate: the start state tiled over all stages, zero inputs —
    acados' default initialization when ``constraints.x0`` is set
    (ref: src/utils/ocp.py:175-177).  Linearizing at zeros instead renders
    the very first QP infeasible for the car configs."""
    if start is None:
        X0 = jnp.zeros((spec.H + 1, spec.ns, spec.nx), dtype)
    else:
        X0 = jnp.broadcast_to(jnp.asarray(start, dtype)[None, None],
                              (spec.H + 1, spec.ns, spec.nx)).copy()
    return X0, jnp.zeros((spec.H, spec.nu), dtype)


def _linearization_inputs(spec: ProblemSpec, ocp: OCPData, X, U):
    """Per-sample (x, u_realized) points (ref: solver.py:86-92)."""
    Xs = jnp.swapaxes(X[:spec.H], 0, 1)                     # (ns, H, nx)
    Ub = jnp.broadcast_to(U[None], (spec.ns,) + U.shape)    # (ns, H, nu)
    if spec.use_feedback:
        Ueff = Ub - (ocp.x_eq[None, None] - Xs) @ ocp.K_fb.T
    else:
        Ueff = Ub
    return jnp.concatenate([Xs, Ueff], axis=-1)             # (ns, H, nx+nu)


def sqp_iteration(spec: ProblemSpec, env: Env, hyp: GPHyperArrays,
                  ocp: OCPData, st_curr, X, U, gp: GPState, eps,
                  axis_name=None, qp_ws=None, qp_valid=None,
                  return_debug: bool = False, hall_empty: bool = False,
                  ordered: bool = False):
    """One full SQP-RTI iteration; returns updated (X, U, gp, status).

    With ``axis_name`` this body runs inside shard_map over the sample axis:
    GP sampling, linearization, condensing and constraint rows are
    shard-local; only the condensed cost and the QP's row-reductions cross
    chips (SURVEY §2.4).  ``hall_empty`` statically specializes the GP
    stage for iteration 0's freshly-reset hallucination buffer.
    """
    H, nx, nu, ns = spec.H, spec.nx, spec.nu, spec.ns

    xu = _linearization_inputs(spec, ocp, X, U)
    Xt = xu[..., jnp.asarray(spec.g_idx_inputs)]            # (ns, H, D)
    dg, gp = agent_mod.sample_dynamics(spec, env, hyp, gp, Xt, eps,
                                       axis_name=axis_name,
                                       hall_empty=hall_empty)
    val, A, B = agent_mod.dyn_linearization(spec, env, xu, dg, ocp.K_fb)

    # delta dynamics: dx_{k+1} = A dx_k + B du_k + r_k with the linearization
    # residual r = f_lin - x̄_{k+1}
    r = val - jnp.swapaxes(X[1:], 0, 1)
    dx0 = jnp.broadcast_to(st_curr[None], (ns, nx)) - X[0]
    T, Gamma = condense(A, B, r, dx0)

    H_U, g_U = build_cost(spec, ocp, T, Gamma, X, U, axis_name=axis_name,
                          ordered=ordered)
    hard = build_hard_rows(spec, ocp, T, Gamma, X, U)
    soft, (zl, zu, Zl, Zu) = build_soft_rows(spec, ocp, T, Gamma, X)
    C_h, d_h = boxes_to_rows(hard.G, hard.lo, hard.hi)
    sol = solve_qp_soft(H_U, g_U, C_h, d_h, soft.G, soft.lo, soft.hi,
                        zl, zu, Zl, Zu, axis_name=axis_name,
                        tol=(spec.qp_tol if spec.qp_tol > 0 else None),
                        ws=qp_ws, ws_valid=qp_valid, ordered=ordered)

    dU = sol.z[:H * nu]
    dX = T + jnp.einsum("ikau,u->ika", Gamma, dU)           # (ns, H+1, nx)
    X_new = X + jnp.swapaxes(dX, 0, 1)
    U_new = U + dU.reshape(H, nu)
    if return_debug:
        return X_new, U_new, gp, sol, {
            "dg": dg, "Xt": Xt,
            # the assembled QP itself (debug/repro: failed instances can
            # be dumped and re-solved standalone)
            "qp": {"H": H_U, "g": g_U, "C_h": C_h, "d_h": d_h,
                   "G_s": soft.G, "lo_s": soft.lo, "hi_s": soft.hi,
                   "zl": zl, "zu": zu, "Zl": Zl, "Zu": Zu},
        }
    return X_new, U_new, gp, sol


def solve(spec: ProblemSpec, env: Env, hyp: GPHyperArrays, ocp: OCPData,
          st_curr, X0, U0, gp0: GPState, eps_iters, axis_name=None,
          qp_ws=None, qp_valid=None, ordered: bool = False):
    """Full SQP solve for one MPC step.

    Args:
        st_curr: (nx,) measured state (x0 equality bound).
        X0, U0: warm-start iterate.
        eps_iters: (max_sqp_iter, ns, g_ny, H, Ty) epistemic draws.
        qp_ws, qp_valid: PDIP warm-start state from the previous MPC step
            (ref: src/utils/ocp.py:310 HPIPM warm start); consecutive SQP
            iterations warm-start from each other automatically.
    Returns:
        SolveState after convergence or max_sqp_iter iterations.
    """
    gp0 = agent_mod.reset_hall(gp0)

    def cond(s: SolveState):
        return (s.it < spec.max_sqp_iter) & ~s.done & (s.status == 0)

    def body(s: SolveState, hall_empty: bool = False):
        eps = jax.lax.dynamic_index_in_dim(eps_iters, s.it, keepdims=False)
        X_cand, U_cand, gp, sol = sqp_iteration(
            spec, env, hyp, ocp, st_curr, s.X, s.U, s.gp, eps,
            axis_name=axis_name, qp_ws=s.qp_ws, qp_valid=s.qp_valid,
            hall_empty=hall_empty, ordered=ordered)
        status = sol.status
        # a FAILED QP's step must not be consumed (ref: solver.py:146-151
        # breaks before fetching the failed solve's iterate): keep the
        # entering iterate and drop the garbage warm-start state.  The GP
        # hallucination append stays — it was drawn at the entering
        # iterate, before the QP (ref: agent sampling precedes the solve).
        # Step consumption, under-relaxation and the convergence predicate
        # (ref: solver.py:57-81) live in consume_step, shared with the
        # host-stepped debug twin.
        ok = status == 0
        (X, U, x_diff, u_diff, done, best_step, stall_count, mono_count,
         alpha) = consume_step(spec, s.X, s.U, X_cand, U_cand, ok,
                               s.best_step, s.stall_count, s.mono_count,
                               s.alpha, axis_name=axis_name, ordered=ordered)
        return SolveState(X=X, U=U, X_prev=s.X, U_prev=s.U, gp=gp,
                          it=s.it + 1, status=status, done=done,
                          qp_ws=sol.state, qp_valid=ok,
                          qp_iters=s.qp_iters + sol.iters,
                          qp_gap=sol.gap, best_step=best_step,
                          stall_count=stall_count, mono_count=mono_count,
                          alpha=alpha)

    if qp_ws is None:
        qp_ws = init_qp_ws(spec, X0.dtype)
        qp_valid = jnp.asarray(False)
    init = SolveState(
        X=X0, U=U0, X_prev=X0, U_prev=U0, gp=gp0,
        it=jnp.asarray(0), status=jnp.asarray(0), done=jnp.asarray(False),
        qp_ws=qp_ws, qp_valid=qp_valid, qp_iters=jnp.asarray(0),
        qp_gap=jnp.asarray(jnp.inf, X0.dtype),
        best_step=jnp.asarray(jnp.inf, X0.dtype),
        stall_count=jnp.asarray(0, jnp.int32),
        mono_count=jnp.asarray(0, jnp.int32),
        alpha=jnp.ones((), X0.dtype))
    # iteration 0 peeled out of the loop: its hallucination buffer is
    # empty BY CONSTRUCTION (reset above), so it runs the statically
    # specialized GP stage; iterations >= 1 run the general body
    first = body(init, hall_empty=True)
    if spec.max_sqp_iter == 1:
        return first
    return jax.lax.while_loop(cond, body, first)


def solve_recorded(spec: ProblemSpec, env: Env, hyp: GPHyperArrays,
                   ocp: OCPData, st_curr, X0, U0, gp0: GPState, eps_iters,
                   qp_ws=None, qp_valid=None, iter_fn=None, probe_fn=None):
    """Debug twin of `solve` that records every SQP iterate.

    Host-stepped (one jitted `sqp_iteration` call per trip) so each
    iterate, its GP function-samples, and the posterior moments of the
    model they were drawn from can be captured — the data behind the
    reference's in-solve debug plots (ref: src/solver.py:153-154,194-352).
    Identical update math and convergence predicate to `solve`; use only
    for debugging (it pays one dispatch per SQP iteration).

    Args:
        iter_fn / probe_fn: optional pre-jitted closures over
            (spec, env, hyp, ocp) to reuse across calls — signatures
            ``iter_fn(st, X, U, gp, eps, ws, wv, hall_empty)`` with
            return_debug=True and ``probe_fn(gp, Xt)``.
    Returns:
        (SolveState, records): records is a list of per-iterate dicts
        with X, U (post-QP), dg, mean, std, x_diff, u_diff.
    """
    if iter_fn is None:
        iter_fn = lambda st, X, U, gp, eps, ws, wv, he: sqp_iteration(
            spec, env, hyp, ocp, st, X, U, gp, eps,
            qp_ws=ws, qp_valid=wv, return_debug=True, hall_empty=he)
    if probe_fn is None:
        probe_fn = lambda gp, Xt: agent_mod.posterior_value_moments(
            spec, hyp, gp, Xt)

    gp = agent_mod.reset_hall(gp0)
    if qp_ws is None:
        qp_ws = init_qp_ws(spec, X0.dtype)
        qp_valid = jnp.asarray(False)
    X, U = X0, U0
    records = []
    it = 0
    status = jnp.asarray(0)
    qp_iters = 0
    x_diff = u_diff = float("inf")
    best_step = jnp.asarray(jnp.inf, X0.dtype)
    stall_count = jnp.asarray(0, jnp.int32)
    mono_count = jnp.asarray(0, jnp.int32)
    alpha = jnp.ones((), X0.dtype)
    # mirror agent.sample_dynamics's EXACT predicate: probing posterior
    # moments is skipped only when no live GP sample is drawn at all
    oracle_only = (
        (spec.true_dyn_as_sample or spec.mean_as_dyn_sample)
        and spec.ns == 1
    ) or (spec.true_dyn_as_sample and spec.mean_as_dyn_sample
          and spec.ns == 2)
    while it < spec.max_sqp_iter:
        # moments of the entering model at the entering iterate
        xu = _linearization_inputs(spec, ocp, X, U)
        Xt = xu[..., jnp.asarray(spec.g_idx_inputs)]
        if oracle_only:
            mean = std = None
        else:
            mean, std = probe_fn(gp, Xt)
        X_cand, U_cand, gp, sol, dbg = iter_fn(
            st_curr, X, U, gp, eps_iters[it], qp_ws, qp_valid, it == 0)
        status = sol.status
        qp_iters += int(sol.iters)
        qp_ws, qp_valid = sol.state, jnp.asarray(int(status) == 0)
        # identical step consumption to solve() (shared helper: failed-QP
        # revert, under-relaxation, convergence predicate)
        (X_new, U_new, x_diff, u_diff, _, best_step, stall_count,
         mono_count, alpha) = consume_step(
            spec, X, U, X_cand, U_cand, status == 0,
            best_step, stall_count, mono_count, alpha)
        x_diff, u_diff = float(x_diff), float(u_diff)
        records.append({
            "X": X_new, "U": U_new, "dg": dbg["dg"],
            "mean": mean, "std": std,
            "x_diff": x_diff, "u_diff": u_diff,
            # per-QP diagnostics (ref prints residuals/iters per SQP iter,
            # src/solver.py:133-144)
            "qp_iters": int(sol.iters), "qp_gap": float(sol.gap),
            "qp_status": int(sol.status), "qp": dbg["qp"],
        })
        X_prev, U_prev = X, U
        X, U = X_new, U_new
        it += 1
        if int(status) != 0:
            break
        if x_diff < spec.tol_nlp and u_diff < spec.tol_nlp:
            break
    st = SolveState(X=X, U=U, X_prev=X_prev, U_prev=U_prev, gp=gp,
                    it=jnp.asarray(it), status=status,
                    done=jnp.asarray(x_diff < spec.tol_nlp
                                     and u_diff < spec.tol_nlp),
                    qp_ws=qp_ws, qp_valid=qp_valid,
                    qp_iters=jnp.asarray(qp_iters), qp_gap=sol.gap,
                    best_step=best_step, stall_count=stall_count,
                    mono_count=mono_count, alpha=alpha)
    return st, records
