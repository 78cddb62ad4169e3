"""Closed-loop receding-horizon MPC driver.

Counterpart of the reference DEMPC orchestrator (ref: src/DEMPC.py:12-112):
the host loop steps the true plant and re-invokes the jitted SQP solve;
warm starting shifts the previous solution (ref: src/solver.py:174-189).
"""

from __future__ import annotations

import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sampling_gpmpc_tpu.utils.termcolor import bcolors

from sampling_gpmpc_tpu import agent as agent_mod
from sampling_gpmpc_tpu.config import ProblemData, ProblemSpec
from sampling_gpmpc_tpu.envs.base import Env
from sampling_gpmpc_tpu.gp.exact import GPHyperArrays
from sampling_gpmpc_tpu.ocp import sqp
from sampling_gpmpc_tpu.ocp.spec import OCPData, make_ocp_data


def shift_solution(spec: ProblemSpec, X, U):
    """Warm-start shift (ref: src/solver.py:174-178): stages move one step
    forward; the terminal state and last input are repeated."""
    X_s = jnp.concatenate([X[1:], X[-1:]], axis=0)
    U_s = jnp.concatenate([U[1:], U[-1:]], axis=0)
    return X_s, U_s


class DEMPC:
    """Owns the jitted solve and the closed-loop state."""

    def __init__(self, params: dict, spec: ProblemSpec, data: ProblemData,
                 env: Env, dtype=None, recorder=None, verbose=False,
                 debug_sqp_dir: Optional[str] = None, live=None):
        from sampling_gpmpc_tpu.setup import default_dtype
        self.verbose = verbose
        # optional in-loop frame grabber (visu.LiveRenderer): the reference
        # plots + grabs a video frame per MPC iteration from inside the
        # loop (ref: src/DEMPC.py:60-66, src/visu.py:36-54)
        self.live = live
        self.spec, self.data, self.env = spec, data, env
        self.dtype = dtype or default_dtype()
        self.ocp = make_ocp_data(spec, data, self.dtype)
        self.hyp = GPHyperArrays.from_spec(spec.gp, self.dtype)
        self.gp_state = agent_mod.init_gp_state(spec, env, self.dtype)
        key = jax.random.PRNGKey(spec.seed)
        self.epistemic = agent_mod.make_epistemic(key, spec, self.dtype)
        self.recorder = recorder

        # donate the per-step-replaced buffers (iterate, GP hallucination
        # buffers, QP warm-start state) so the device updates them in
        # place instead of re-allocating each MPC step; CPU has no
        # donation support and would only warn
        donate = ((1, 2, 3, 5) if jax.default_backend() != "cpu" else ())
        self._solve = jax.jit(
            lambda st, X, U, gp, eps, ws, wv: sqp.solve(
                spec, env, self.hyp, self.ocp, st, X, U, gp, eps,
                qp_ws=ws, qp_valid=wv),
            donate_argnums=donate)
        # opt-in per-SQP-iterate recording (ref: src/solver.py:153-154):
        # frames rendered per MPC step into debug_sqp_dir
        self.debug_sqp_dir = debug_sqp_dir
        self.sqp_records = []
        if debug_sqp_dir is not None:
            dbg_fns = {
                he: jax.jit(
                    lambda st, X, U, gp, eps, ws, wv, _he=he:
                    sqp.sqp_iteration(
                        spec, env, self.hyp, self.ocp, st, X, U, gp, eps,
                        qp_ws=ws, qp_valid=wv, return_debug=True,
                        hall_empty=_he))
                for he in (False, True)}
            self._solve_iter_dbg = (
                lambda st, X, U, gp, eps, ws, wv, he:
                dbg_fns[he](st, X, U, gp, eps, ws, wv))
            self._probe_dbg = jax.jit(
                lambda gp, Xt: agent_mod.posterior_value_moments(
                    spec, self.hyp, gp, Xt))
        self._plant = jax.jit(env.discrete_dyn)
        self._rollouts = jax.jit(self._make_record_rollouts())

        if spec.dynamics_rejection:
            from sampling_gpmpc_tpu.reachability import reject_and_resample
            tight = params["agent"]["tight"]
            Bd_norm = float(np.sqrt(data.P_term[1][1]))
            var_eps = (float(tight["dyn_eps"]) + float(tight["w_bound"])) \
                * Bd_norm
            fb = ({"K": data.K_fb, "x_eq": data.goal}
                  if spec.use_feedback else None)
            self._reject = jax.jit(
                lambda gp, X, U, xn, key: reject_and_resample(
                    spec, env, self.hyp, gp, X, U, xn,
                    jnp.asarray(data.ci, self.dtype), key, var_eps,
                    use_feedback=fb))
            self._reject_key = jax.random.PRNGKey(spec.seed + 1)

    def _make_record_rollouts(self):
        """Build the jitted recorder probes: the plan's inputs rolled through
        (a) the true dynamics — the linearization-error probe (ref:
        src/visu.py:486-491) — and (b) the real-data GP posterior-mean
        dynamics (ref: src/visu.py:235-258 propagate_mean_dyn).  Both run as
        one ``lax.scan`` per MPC step: on the TPU relay this costs a single
        RPC instead of H eager per-step calls."""
        from sampling_gpmpc_tpu.gp.kernel import kernel_matrix
        from sampling_gpmpc_tpu.setup import full_precision

        spec, env, data = self.spec, self.env, self.data
        hyp = self.hyp
        use_fb = spec.use_feedback
        g_idx = np.asarray(spec.g_idx_inputs)
        wg = spec.use_derivatives

        @full_precision
        def rollouts(x0, U, Z_r, rf):
            K = jnp.asarray(data.K_fb, x0.dtype) if use_fb else None
            x_eq = jnp.asarray(data.goal, x0.dtype)
            # mean = (Kx ⊙ m) @ L^-T w  ==  Kx @ (m ⊙ L^-T w)
            alpha = jax.vmap(
                lambda L, w, m: m * jax.scipy.linalg.solve_triangular(
                    L.T, w, lower=False))(rf["L"], rf["w"], rf["mask"])

            def eff_u(x, u_t):
                return u_t - (x_eq - x) @ K.T if use_fb else u_t

            def step_true(x, u_t):
                xn = env.discrete_dyn(x, eff_u(x, u_t))
                return xn, xn

            def gp_mean_rows(xt):
                def one(ls, os_, a):
                    Kx = kernel_matrix(xt[None], Z_r, ls, os_, wg)
                    return (Kx @ a)[:spec.Ty]
                return jax.vmap(one)(hyp.lengthscale, hyp.outputscale, alpha)

            def step_mean(x, u_t):
                u = eff_u(x, u_t)
                xu = jnp.concatenate([x, u])
                dg = gp_mean_rows(xu[g_idx])          # (g_ny, Ty)
                xn = env.assemble_val_jac(xu, dg)[:, 0]
                return xn, xn

            _, Xt = jax.lax.scan(step_true, x0, U)
            _, Xm = jax.lax.scan(step_mean, x0, U)
            return (jnp.concatenate([x0[None], Xt], axis=0),
                    jnp.concatenate([x0[None], Xm], axis=0))

        return rollouts

    def _render_sqp_records(self, mpc_iter: int, recs):
        """Dump per-SQP-iterate debug frames (ref: src/solver.py:194-352)."""
        import os

        from sampling_gpmpc_tpu import visu

        bounds = np.stack([self.data.x_min, self.data.x_max])
        for it, r in enumerate(recs):
            out = os.path.join(self.debug_sqp_dir,
                               f"sqp_m{mpc_iter:03d}_i{it:02d}.png")
            visu.plot_sqp_iterate(
                out, np.asarray(r["X"]), np.asarray(r["U"]),
                dg=np.asarray(r["dg"]),
                mean=None if r["mean"] is None else np.asarray(r["mean"]),
                std=None if r["std"] is None else np.asarray(r["std"]),
                x_bounds=bounds)
            self.sqp_records.append({
                "mpc_iter": mpc_iter, "sqp_iter": it, "frame": out,
                "x_diff": r["x_diff"], "u_diff": r["u_diff"],
            })

    def record_rollouts(self, x0, U):
        """True-dynamics + GP-mean re-propagation of a plan (numpy out)."""
        t, m = self._rollouts(jnp.asarray(x0, self.dtype),
                              jnp.asarray(U, self.dtype),
                              self.gp_state.real_Z, self.gp_state.real_fact)
        return np.asarray(t), np.asarray(m)

    def run(self, x0: Optional[np.ndarray] = None):
        """Full closed loop (ref: src/DEMPC.py:39-80). Returns trajectories."""
        spec = self.spec
        x_curr = jnp.asarray(x0 if x0 is not None else self.data.start,
                             self.dtype)
        X, U = sqp.init_iterate(spec, self.dtype, self.data.start)
        phys, inputs, plans, times, survivors = [], [], [], [], []
        qp_iters, statuses, gaps = [], [], []
        # QP warm start carries across MPC steps (the row structure is
        # identical; ref: src/utils/ocp.py:310 HPIPM warm start)
        qp_ws = sqp.init_qp_ws(spec, self.dtype)
        qp_valid = jnp.asarray(False)

        for m in range(spec.num_mpc_iter):
            t0 = time.perf_counter()
            if self.debug_sqp_dir is not None:
                st, recs = sqp.solve_recorded(
                    spec, self.env, self.hyp, self.ocp, x_curr, X, U,
                    self.gp_state, self.epistemic[m], qp_ws, qp_valid,
                    iter_fn=self._solve_iter_dbg, probe_fn=self._probe_dbg)
                self._render_sqp_records(m, recs)
            else:
                st = self._solve(x_curr, X, U, self.gp_state,
                                 self.epistemic[m], qp_ws, qp_valid)
            st.X.block_until_ready()
            qp_ws, qp_valid = st.qp_ws, st.qp_valid
            dt_solve = time.perf_counter() - t0

            X, U, self.gp_state = st.X, st.U, st.gp
            u0 = U[0]
            if spec.use_feedback:
                K = jnp.asarray(self.data.K_fb, self.dtype)
                u0 = u0 - (jnp.asarray(self.data.goal, self.dtype)
                           - X[0, 0]) @ K.T
            x_next = self._plant(X[0, 0], u0)

            phys.append(np.asarray(x_curr))
            inputs.append(np.asarray(U))
            plans.append(np.asarray(X))
            times.append(dt_solve)
            qp_iters.append(int(st.qp_iters))
            statuses.append(int(st.status))
            gaps.append(float(st.qp_gap))
            if self.verbose:
                # per-step console line (ref: src/DEMPC.py:72-79)
                print(f"{bcolors.green}Reached: {m} "
                      f"{np.round(np.asarray(x_curr), 4)} "
                      f"u0={np.round(np.asarray(u0), 4)} "
                      f"sqp_iters={int(st.it)} status={int(st.status)} "
                      f"solve={dt_solve:.3f}s{bcolors.ENDC}")
            if self.recorder is not None:
                self.recorder.record(np.asarray(x_curr), np.asarray(X),
                                     np.asarray(U), dt_solve, self)
            if self.live is not None:
                self.live.grab(np.asarray(x_curr), np.asarray(X))

            x_curr = x_next.reshape(-1)
            if spec.dynamics_rejection:
                self._reject_key, sub = jax.random.split(self._reject_key)
                self.gp_state, n_alive = self._reject(
                    self.gp_state, X, U, x_curr, sub)
                survivors.append(int(n_alive))
                if self.verbose:
                    # per-step survivor count (ref: src/agent.py:354,394)
                    print(f"{bcolors.OKCYAN}Samples remaining in N(k+1): "
                          f"{int(n_alive)}/{spec.ns}{bcolors.ENDC}")
            if spec.shift_soln:
                X, U = shift_solution(spec, X, U)

        return {
            "physical_state_traj": phys,
            "input_traj": inputs,
            "state_traj": plans,
            "solver_time": times,
            "final_state": np.asarray(x_curr),
            "sqp_iters": int(st.it),
            "sqp_status": int(st.status),
            "sqp_done": bool(st.done),
            "qp_iters": qp_iters,
            "sqp_status_traj": statuses,
            "qp_gap_traj": gaps,
            "rejection_survivors": survivors,
        }
