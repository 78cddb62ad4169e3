"""Approximate sampling-based MPC: nominal model + sampled tightenings.

Instead of the augmented multi-sample OCP, solve a *single* nominal MPC
(BLR mean-weight dynamics) whose constraints are tightened per stage by
the spread of sampled-weight trajectory rollouts:

    Delta_k = max_n | x_k^n - x_k^mu |        (per state dimension)

(ref: extra/approx_sampling_mpc/README.md, src/solver.py:77-135,215-400).
The path-tracking cost follows a per-stage reference (heart curve), the
obstacle circles are tightened by ||Delta_k[:2]|| and the terminal
(vx, vy) set is an ellipse.  Built on the same condensing + structured
PDIP machinery as the main solver.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sampling_gpmpc_tpu.approx import blr
from sampling_gpmpc_tpu.approx.drone import DroneModel
from sampling_gpmpc_tpu.ocp.condense import condense_single
from sampling_gpmpc_tpu.ocp.qp import boxes_to_rows, solve_qp_soft


class ApproxMPC:
    def __init__(self, params: dict, dtype=jnp.float64):
        self.params = params
        self.dtype = dtype
        self.model = DroneModel(params)
        self.feats = self.model.features()
        self.step_fn, self.val_jac_fn = blr.make_dynamics(self.feats,
                                                          self.model.nx)
        opt = params["optimizer"]
        ag = params["agent"]
        self.H = opt["H"]
        self.nx, self.nu = self.model.nx, self.model.nu
        self.max_sqp_iter = opt["SEMPC"]["max_sqp_iter"]
        self.lm = float(opt["options"]["levenberg_marquardt"])
        self.n_tight = int(ag.get("num_samples_tightening", 100))
        self.Qx = jnp.asarray(np.diag(opt["Qx"]), dtype)      # on (px, py)
        self.Qu = jnp.asarray(np.diag(opt["Qu"]), dtype)
        self.x_min = jnp.asarray(opt["x_min"], dtype)
        self.x_max = jnp.asarray(opt["x_max"], dtype)
        self.u_min = jnp.asarray(opt["u_min"], dtype)
        self.u_max = jnp.asarray(opt["u_max"], dtype)
        self.obstacles = jnp.asarray(self.model.obstacles(), dtype)
        tt = opt["terminal_tightening"]
        self.P_term = jnp.asarray(tt["P"], dtype)             # on (vx, vy)
        self.delta = float(tt["delta"])
        self.x_term = jnp.asarray(params["env"]["terminate_state"], dtype)

        # BLR posterior over the prior dataset, kept as sufficient
        # statistics so active learning can absorb observed transitions
        # (ref: extra/approx_sampling_mpc/src/DEMPC.py:75-81)
        X, Y = self.model.training_grid()
        self._noise_var = float(ag["BLR"]["noise_var"])
        self._stats = blr.stats_fit(self.feats, X, Y,
                                    float(ag["BLR"]["lambda_reg"]))
        self.post = blr.posterior_from_stats(self._stats, self._noise_var,
                                             dtype)
        run = ag.get("run", {})
        self._use_gt_weights = bool(run.get("true_param_as_sample", False))
        if self._use_gt_weights:
            W = self._pad_weights(self.model.gt_weights())
        else:
            # nominal = posterior mean (ref mean_as_dyn_sample=True path)
            W = self.post.mu
        self.W_nominal = W
        al = params["common"].get("active_learning", {}) or {}
        self.al_use = bool(al.get("use", False))
        self.al_freq = max(1, int(al.get("frequency", 1)))

        self._solve = jax.jit(self._sqp_solve)
        self._tighten = jax.jit(self._tightening)
        self._plant = jax.jit(
            lambda x, u: self.model.discrete_dyn(x, u))
        self._opt_iter = None          # built lazily, jitted once

    def _pad_weights(self, w_list):
        F = self.post.mu.shape[1]
        W = np.zeros((self.nx, F))
        for j, w in enumerate(w_list):
            W[j, :len(w)] = w
        return jnp.asarray(W, self.dtype)

    def observe(self, x, u) -> None:
        """Online-learn one true transition (active learning).

        Mirrors ref DEMPC.py:75-81 / agent.py:270-273: evaluate the true
        dynamics at the current (state, input), absorb it into the weight
        posterior, refresh the nominal model.  The posterior is threaded
        through the jitted solve as an ARGUMENT, so no retrace happens.
        """
        y = np.asarray(self._plant(jnp.asarray(x, self.dtype),
                                   jnp.asarray(u, self.dtype)))
        self._stats = blr.stats_update(self._stats, self.feats,
                                       np.asarray(x), np.asarray(u), y)
        self.post = blr.posterior_from_stats(self._stats, self._noise_var,
                                             self.dtype)
        if not self._use_gt_weights:
            self.W_nominal = self.post.mu

    def _tightening(self, x0, U, key, post, W_nom):
        """Delta_k = max_n |x^n_k - x^mu_k| (ref: solver.py:84-135)."""
        Ws = blr.sample_weights(post, key, self.n_tight)
        X_mu = blr.rollout(self.step_fn, x0, U, W_nom)
        X_s = jax.vmap(lambda W: blr.rollout(self.step_fn, x0, U, W))(Ws)
        return jnp.max(jnp.abs(X_s - X_mu[None]), axis=0)     # (H+1, nx)

    def _sqp_iteration(self, x0, X, U, wpath, delta, W_nom):
        H, nx, nu = self.H, self.nx, self.nu
        nU = H * nu
        dtype = self.dtype

        vj = jax.vmap(lambda x, u: self.val_jac_fn(x, u, W_nom))(
            X[:H], U)
        val = vj[:, :, 0]
        A = vj[:, :, 1:1 + nx]
        B = vj[:, :, 1 + nx:]
        r = val - X[1:]
        T, Gamma = condense_single(A, B, r, x0 - X[0])

        # cost: track the path on (px, py) per stage incl. terminal + u cost
        Qfull = jnp.zeros((nx, nx), dtype).at[:2, :2].set(self.Qx)
        xref = jnp.zeros((H + 1, nx), dtype).at[:, :2].set(wpath)
        Hx = 2.0 * Qfull[None] + self.lm * jnp.eye(nx, dtype=dtype)[None]
        xerr = X + T - xref
        grad_x = 2.0 * jnp.einsum("ab,kb->ka", Qfull, xerr) + self.lm * T
        H_U = jnp.einsum("kau,kab,kbv->uv", Gamma, Hx, Gamma)
        g_U = jnp.einsum("kau,ka->u", Gamma, grad_x)
        Hu = 2.0 * self.Qu + self.lm * jnp.eye(nu, dtype=dtype)
        H_U = H_U + jnp.kron(jnp.eye(H, dtype=dtype), Hu)
        g_U = g_U + (2.0 * U @ self.Qu).reshape(nU)

        xpred = X + T
        rows_G, rows_lo, rows_hi = [], [], []
        # input box
        sel = jnp.eye(nU, dtype=dtype)
        rows_G.append(sel)
        rows_lo.append((self.u_min[None] - U).reshape(nU))
        rows_hi.append((self.u_max[None] - U).reshape(nU))
        # tightened state box stages 1..H
        rows_G.append(Gamma[1:].reshape(H * nx, nU))
        rows_lo.append((self.x_min[None] + delta[1:] - xpred[1:]).reshape(-1))
        rows_hi.append((self.x_max[None] - delta[1:] - xpred[1:]).reshape(-1))
        # terminal (vx, vy) ellipse <= delta
        ve = X[H, 3:5] - self.x_term
        q0 = ve @ self.P_term @ ve
        J = 2.0 * self.P_term @ ve                     # (2,)
        Gt = (J[None, :] @ Gamma[H, 3:5]).reshape(1, nU)
        const = q0 + J @ T[H, 3:5]
        rows_G.append(Gt)
        rows_lo.append(jnp.asarray([0.0 - const], dtype))
        rows_hi.append(jnp.asarray([self.delta - const], dtype))

        hard_G = jnp.concatenate(rows_G)
        hard_lo = jnp.concatenate(rows_lo)
        hard_hi = jnp.concatenate(rows_hi)
        C_h, d_h = boxes_to_rows(hard_G, hard_lo, hard_hi)

        # obstacle circles (soft, heavily penalized: the reference's hard
        # rows rely on HPIPM surviving transient infeasibility)
        if self.obstacles.shape[0]:
            cx, cy, rr = (self.obstacles[:, 0], self.obstacles[:, 1],
                          self.obstacles[:, 2])
            pos_t = jnp.linalg.norm(delta[:, :2], axis=1)     # (H+1,)
            px = xpred[:, 0][:, None] - cx[None]
            py = xpred[:, 1][:, None] - cy[None]
            q = px * px + py * py                             # (H+1, n_obs)
            Gx = (2 * px[..., None] * Gamma[:, 0][:, None, :]
                  + 2 * py[..., None] * Gamma[:, 1][:, None, :])
            r_t = (rr[None] + pos_t[:, None]) ** 2
            m = (self.H + 1) * self.obstacles.shape[0]
            G_s = Gx.reshape(m, nU)
            lo_s = (r_t - q).reshape(m)
            hi_s = jnp.full((m,), 1e8, dtype)
            pen = jnp.full((m,), 1e6, dtype)
            Pen = jnp.full((m,), 1e6, dtype)
        else:
            G_s = jnp.zeros((0, nU), dtype)
            lo_s = hi_s = pen = Pen = jnp.zeros((0,), dtype)

        sol = solve_qp_soft(H_U, g_U, C_h, d_h, G_s, lo_s, hi_s,
                            pen, pen, Pen, Pen)
        dU = sol.z
        dX = T + jnp.einsum("kau,u->ka", Gamma, dU)
        return X + dX, U + dU.reshape(H, nu), sol.status

    def _sqp_solve(self, x0, X, U, wpath, delta, W_nom):
        def body(i, carry):
            X, U, status = carry
            X, U, status = self._sqp_iteration(x0, X, U, wpath, delta,
                                               W_nom)
            return X, U, status

        return jax.lax.fori_loop(0, self.max_sqp_iter, body,
                                 (X, U, jnp.asarray(0)))

    # ------------------------------------------------------------------
    # Optimistic OCP: augment the input with per-stage eta in [-1, 1]^nx
    # scaling the weight posterior stds, so the optimizer may pick any
    # dynamics within the beta-confidence set (exploration planning,
    # ref: extra/approx_sampling_mpc/src/utils/optimistic_ocp.py,
    # src/agent.py:886-935).
    # ------------------------------------------------------------------

    def _opt_cfg(self):
        return self.params.get("optimistic_optimizer",
                               self.params["optimizer"])

    def optimistic_step(self, x, u, eta, post=None):
        """Dynamics with eta-scaled weights: w_j = mu_j + eta_j beta sigma_j."""
        post = self.post if post is None else post
        beta = float(self.params["agent"].get("Dyn_gp_beta", 2.0))
        sig = jnp.sqrt(jax.vmap(jnp.diagonal)(
            jnp.einsum("jab,jcb->jac", post.chol, post.chol)))
        W = post.mu + eta[:, None] * beta * sig * post.mask
        return self.step_fn(x, u, W)

    def solve_optimistic(self, x0, wpath=None, max_sqp_iter=None,
                         X0=None, U0=None):
        """Optimistic plan from x0; returns (X, U_aug, status).

        U_aug stacks (u, eta) per stage; eta is box-bounded to [-1, 1].
        X0/U0 optionally warm-start the SQP (the reference shifts the
        optimistic solution between MPC steps too, solver.py
        get_and_shift_solution).  The per-iteration solve is jitted ONCE
        per instance (posterior threaded as an argument, like the
        pessimistic path).
        """
        cfg = self._opt_cfg()
        H, nx = self.H, self.nx
        nu_a = self.nu + nx
        dtype = self.dtype
        max_sqp_iter = max_sqp_iter or cfg["SEMPC"]["max_sqp_iter"]
        if wpath is None:
            wpath = jnp.asarray(self.model.path_generator(0), dtype)

        x0 = jnp.asarray(x0, dtype)
        X = (jnp.broadcast_to(x0[None], (H + 1, nx)).astype(dtype)
             if X0 is None else jnp.asarray(X0, dtype))
        U = (jnp.zeros((H, nu_a), dtype) if U0 is None
             else jnp.asarray(U0, dtype))

        if self._opt_iter is None:
            self._opt_iter = self._build_opt_iteration()
        status = jnp.asarray(0)
        for _ in range(max_sqp_iter):
            X, U, status = self._opt_iter(X, U, x0, wpath, self.post)
        return X, U, int(status)

    def _build_opt_iteration(self):
        """Jitted optimistic SQP iteration (built once per instance)."""
        cfg = self._opt_cfg()
        H, nx, nu = self.H, self.nx, self.nu
        nu_a = nu + nx
        dtype = self.dtype
        lm = float(cfg["options"]["levenberg_marquardt"])
        Qx = jnp.asarray(np.diag(cfg["Qx"][:2]), dtype)
        Qu_a = jnp.zeros((nu_a, nu_a), dtype).at[:nu, :nu].set(
            jnp.asarray(np.diag(cfg["Qu"][:nu]), dtype))

        def aug_step(x, ua, post):
            return self.optimistic_step(x, ua[:nu], ua[nu:], post)

        def val_jac(x, ua, post):
            val = aug_step(x, ua, post)
            Jx = jax.jacfwd(aug_step, argnums=0)(x, ua, post)
            Ju = jax.jacfwd(aug_step, argnums=1)(x, ua, post)
            return val, Jx, Ju

        @jax.jit
        def iteration(X, U, x0, wpath, post):
            val, A, B = jax.vmap(lambda x, ua: val_jac(x, ua, post))(
                X[:H], U)
            r = val - X[1:]
            T, Gamma = condense_single(A, B, r, x0 - X[0])

            Qfull = jnp.zeros((nx, nx), dtype).at[:2, :2].set(Qx)
            xref = jnp.zeros((H + 1, nx), dtype).at[:, :2].set(wpath)
            Hx = 2.0 * Qfull[None] + lm * jnp.eye(nx, dtype=dtype)[None]
            xerr = X + T - xref
            grad_x = 2.0 * jnp.einsum("ab,kb->ka", Qfull, xerr) + lm * T
            H_U = jnp.einsum("kau,kab,kbv->uv", Gamma, Hx, Gamma)
            g_U = jnp.einsum("kau,ka->u", Gamma, grad_x)
            Hu = 2.0 * Qu_a + lm * jnp.eye(nu_a, dtype=dtype)
            H_U = H_U + jnp.kron(jnp.eye(H, dtype=dtype), Hu)
            g_U = g_U + (2.0 * U @ Qu_a).reshape(H * nu_a)

            # input box: physical u bounds + eta in [-1, 1]
            u_lo = jnp.concatenate([self.u_min, -jnp.ones(nx, dtype)])
            u_hi = jnp.concatenate([self.u_max, jnp.ones(nx, dtype)])
            sel = jnp.eye(H * nu_a, dtype=dtype)
            lo = (u_lo[None] - U).reshape(-1)
            hi = (u_hi[None] - U).reshape(-1)
            # state box stages 1..H
            xpred = X + T
            Gx = Gamma[1:].reshape(H * nx, H * nu_a)
            lo_x = (self.x_min[None] - xpred[1:]).reshape(-1)
            hi_x = (self.x_max[None] - xpred[1:]).reshape(-1)
            C_h, d_h = boxes_to_rows(jnp.concatenate([sel, Gx]),
                                     jnp.concatenate([lo, lo_x]),
                                     jnp.concatenate([hi, hi_x]))
            empty = jnp.zeros((0,), dtype)
            sol = solve_qp_soft(H_U, g_U, C_h, d_h,
                                jnp.zeros((0, H * nu_a), dtype),
                                empty, empty, empty, empty, empty, empty)
            dU = sol.z
            dX = T + jnp.einsum("kau,u->ka", Gamma, dU)
            return X + dX, U + dU.reshape(H, nu_a), sol.status

        return iteration

    def run(self, num_iters=None, x0=None, key=None):
        """Closed loop (ref: demo_obstacle_avoidance.py).

        Planner selection mirrors the reference's flag pair (ref:
        extra/approx_sampling_mpc/src/DEMPC.py:56-61): `run.optimistic`
        plans with the eta-augmented exploration OCP, `run.pessimistic`
        (which wins when both are set, like the reference's ordering)
        with the tightened nominal OCP.
        """
        import time
        num_iters = num_iters or self.params["common"]["num_MPC_itrs"]
        key = key if key is not None else jax.random.PRNGKey(
            self.params["experiment"]["rnd_seed"]["value"])
        run_cfg = self.params["agent"].get("run", {})
        pessimistic = bool(run_cfg.get("pessimistic", True))
        optimistic = bool(run_cfg.get("optimistic", False)) and \
            not pessimistic
        x = jnp.asarray(x0 if x0 is not None else
                        self.params["env"]["start"], self.dtype)
        X = jnp.broadcast_to(x[None], (self.H + 1, self.nx)).astype(self.dtype)
        U = jnp.zeros((self.H, self.nu), self.dtype)

        phys, times, plans, tight_hist = [], [], [], []
        for m in range(num_iters):
            wpath = jnp.asarray(self.model.path_generator(m), self.dtype)
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            if optimistic:
                delta = jnp.zeros((self.H + 1, self.nx), self.dtype)
                X_a, U_a, status = self.solve_optimistic(
                    x, wpath=wpath,
                    X0=X_aug if m > 0 else None,
                    U0=U_aug if m > 0 else None)
                # shift-carry the augmented solution (ref shifts the
                # optimistic solver's iterate too)
                X_aug = jnp.concatenate([X_a[1:], X_a[-1:]])
                U_aug = jnp.concatenate([U_a[1:], U_a[-1:]])
                X, U = X_a, U_a[:, :self.nu]
            else:
                delta = self._tighten(x, U, sub, self.post,
                                      self.W_nominal)
                X, U, status = self._solve(x, X, U, wpath, delta,
                                           self.W_nominal)
            X.block_until_ready()
            times.append(time.perf_counter() - t0)

            u0 = U[0]
            if self.al_use and m % self.al_freq == 0:
                # observe the true transition at (x, u0) BEFORE stepping
                # (ref DEMPC.py:72-81 learns at X_true_traj[0], U[0])
                self.observe(np.asarray(X[0]), np.asarray(u0))
            phys.append(np.asarray(x))
            plans.append(np.asarray(X))
            tight_hist.append(np.asarray(delta))
            x = self._plant(X[0], u0)
            # warm-start shift
            X = jnp.concatenate([X[1:], X[-1:]])
            U = jnp.concatenate([U[1:], U[-1:]])

        return {"physical_state_traj": phys, "state_traj": plans,
                "solver_time": times, "tightenings": tight_hist,
                "final_state": np.asarray(x), "status": int(status)}
