"""Device-side OCP data: cost weights, references, bounds, penalties.

Built once from the host :class:`ProblemData`, this pytree carries every
numeric array the jitted SQP step needs.  The per-stage cost is normalized
to the form

    sum_i w_i (x_i,k - xref_k)' Qs (x_i,k - xref_k)  +  u_k' Qu u_k

which covers both the reference's "expected" cost (ref: src/utils/ocp.py:148-156,
w_i = 1/ns, xref = goal) and the input-generation lane-change cost
(ref: src/utils/ocp.py:141-146, w = [1/ns, 0, ...], Qs = diag(0, Qx11, 0, Qx33),
xref_k = (·, cw_k, ·, v_max)).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from sampling_gpmpc_tpu.config import ProblemData, ProblemSpec


class OCPData(NamedTuple):
    Qs: jnp.ndarray          # (nx, nx) stage state weight
    Qe: jnp.ndarray          # (nx, nx) terminal state weight
    Qu: jnp.ndarray          # (nu, nu)
    xref: jnp.ndarray        # (H+1, nx); row H is the terminal reference
    w_cost: jnp.ndarray      # (ns,) per-sample cost weights
    lm: jnp.ndarray          # scalar Levenberg-Marquardt
    u_lo: jnp.ndarray        # (nu,) bounds on the OCP input variable
    u_hi: jnp.ndarray
    x_lo: jnp.ndarray        # (H+1, nx) per-stage (tightened) state bounds
    x_hi: jnp.ndarray
    fb_lo: jnp.ndarray       # (H, nu) bounds on the realized feedback input
    fb_hi: jnp.ndarray
    K_fb: jnp.ndarray        # (nu, nx) ancillary gain (zeros if unused)
    x_eq: jnp.ndarray        # (nx,) feedback equilibrium (goal state)
    P_term: jnp.ndarray      # (nx, nx) terminal ellipse metric (zeros if unused)
    delta_sq: jnp.ndarray    # scalar delta^2
    ellipses: jnp.ndarray    # (n_ell, 5)
    start: jnp.ndarray       # (nx,)
    # soft-constraint penalties (acados z/Z convention: z's + 0.5 s'Zs)
    zl_term: jnp.ndarray
    zu_term: jnp.ndarray
    Zl_term: jnp.ndarray
    Zu_term: jnp.ndarray
    zl_path: jnp.ndarray
    zu_path: jnp.ndarray
    Zl_path: jnp.ndarray
    Zu_path: jnp.ndarray


def make_ocp_data(spec: ProblemSpec, data: ProblemData, dtype) -> OCPData:
    H, nx, nu, ns = spec.H, spec.nx, spec.nu, spec.ns
    Qx = np.asarray(data.Qx)
    if spec.input_generation:
        # cost on (lane position, velocity) of sample 0 only
        Qs = np.zeros((nx, nx))
        Qs[1, 1] = Qx[1, 1]
        Qs[3, 3] = Qx[3, 3]
        Qe = np.zeros((nx, nx))
        Qe[1, 1] = Qx[1, 1]
        xref = np.zeros((H + 1, nx))
        xref[:, 1] = data.w_profile
        xref[:, 3] = data.x_max[3]
        xref[H] = 0.0
        xref[H, 1] = 1.95
        w_cost = np.zeros(ns)
        w_cost[0] = 1.0 / ns
    else:
        Qs = Qx
        Qe = Qx
        xref = np.tile(data.goal, (H + 1, 1))
        if spec.cost_mean_only:
            w_cost = np.zeros(ns)
            w_cost[0] = 1.0
        else:
            w_cost = np.full(ns, 1.0 / ns)

    # per-stage state bounds, tightened by the reachability ball when enabled
    # (intersection of the reference's hard box and its tightened h-rows,
    #  ref: src/utils/ocp.py:59-62,172-184)
    x_lo = np.tile(data.x_min, (H + 1, 1))
    x_hi = np.tile(data.x_max, (H + 1, 1))
    fb_lo = np.tile(data.u_min, (H, 1))
    fb_hi = np.tile(data.u_max, (H, 1))
    if spec.use_tightening:
        x_lo = x_lo + data.tilde_eps[:, :nx]
        x_hi = x_hi - data.tilde_eps[:, :nx]
        if spec.env_name == "Pendulum1D":
            # input tightening on the realized feedback input
            fb_lo = fb_lo + data.tilde_eps[:H, nx:nx + nu]
            fb_hi = fb_hi - data.tilde_eps[:H, nx:nx + nu]

    if spec.use_feedback:
        u_lo, u_hi = data.v_min, data.v_max
        K = data.K_fb
    else:
        u_lo, u_hi = data.u_min, data.u_max
        K = np.zeros((nu, nx))

    P_term = data.P_term if data.P_term is not None else np.zeros((nx, nx))

    f = lambda a: jnp.asarray(a, dtype)
    return OCPData(
        Qs=f(Qs), Qe=f(Qe), Qu=f(data.Qu), xref=f(xref), w_cost=f(w_cost),
        lm=f(spec.levenberg_marquardt),
        u_lo=f(u_lo), u_hi=f(u_hi), x_lo=f(x_lo), x_hi=f(x_hi),
        fb_lo=f(fb_lo), fb_hi=f(fb_hi),
        K_fb=f(K), x_eq=f(data.goal),
        P_term=f(P_term), delta_sq=f(data.delta_term ** 2),
        ellipses=f(data.ellipses), start=f(data.start),
        # acados slack penalties (ref: ocp.py:205-215 terminal, :279-287 path)
        zl_term=f(1e7), zu_term=f(1e6), Zl_term=f(1e7), Zu_term=f(1e6),
        zl_path=f(1e6), zu_path=f(1e5), Zl_path=f(1e6), Zu_path=f(1e5),
    )
