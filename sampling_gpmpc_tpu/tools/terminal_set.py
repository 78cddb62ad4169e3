"""Terminal set / ancillary gain synthesis (E2).

Produces the (P, K, delta, rho) terminal ingredients consumed by the YAML
configs.  The reference solves a min -logdet LMI with cvxpy over gridded
(A, B) vertices (ref: extra/pendulum_mpi.py:106-165, car_mpi.py:14-60); no
SDP solver is baked into this image, so we synthesize via the classical
Riccati route and *verify* the same contraction and constraint-containment
conditions a posteriori over sampled vertices:

  1. (A0, B0) = true-dynamics Jacobians at the equilibrium; K = dLQR gain,
     P = DARE solution (scaled).
  2. rho = max_i || P^{1/2} (A_i - B_i K) P^{-1/2} ||_2 over sampled
     linearizations — must be < 1 for invariance.
  3. delta = largest ellipse radius such that {x : (x-xe)' P (x-xe) <= d^2}
     satisfies the state box and the feedback-input box.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from sampling_gpmpc_tpu.envs.base import Env
from sampling_gpmpc_tpu.tools.lipschitz import closed_loop_jacobian


class TerminalSet(NamedTuple):
    P: np.ndarray
    K: np.ndarray
    delta: float
    rho: float


def equilibrium_jacobians(env: Env, x_eq, u_eq):
    xu = jnp.concatenate([jnp.asarray(x_eq), jnp.asarray(u_eq)])
    dg = env.g_prior(env.g_inputs(xu))
    comb = env.assemble_val_jac(xu, dg)
    nx = env.spec.nx
    return np.asarray(comb[:, 1:1 + nx]), np.asarray(comb[:, 1 + nx:])


def synthesize(env: Env, x_eq, u_eq, Qx, Qu, x_min, x_max, u_min, u_max,
               vertices=None) -> TerminalSet:
    """Riccati-based terminal ingredients with vertex verification.

    Args:
        vertices: optional (N, nx+nu) linearization points for the
            contraction check (defaults to the equilibrium only).
    """
    A0, B0 = equilibrium_jacobians(env, x_eq, u_eq)
    Qx = np.asarray(Qx, dtype=np.float64)
    Qu = np.asarray(Qu, dtype=np.float64)
    P = scipy.linalg.solve_discrete_are(A0, B0, Qx, Qu)
    # negate the DARE gain into the config convention: the controller
    # applies u = -K(x_eq - x), so the stabilizing config gain is -K_dare
    # (matching the signs of the published terminal_tightening.K values)
    K = -np.linalg.inv(Qu + B0.T @ P @ B0) @ (B0.T @ P @ A0)

    # contraction factor over the sampled vertices
    w, V = np.linalg.eigh(P)
    P_half = V @ np.diag(np.sqrt(w)) @ V.T
    P_half_inv = V @ np.diag(1.0 / np.sqrt(w)) @ V.T
    pts = (np.asarray(vertices) if vertices is not None
           else np.concatenate([x_eq, u_eq])[None])
    rho = 0.0
    for xu in pts:
        J = np.asarray(closed_loop_jacobian(env, jnp.asarray(xu),
                                            jnp.asarray(K)))
        rho = max(rho, np.linalg.norm(P_half @ J @ P_half_inv, 2))

    # largest delta with the ellipse inside the state box and the feedback
    # inputs -K(x_eq - x) inside the input box:
    # support of the ellipse along e_i is sqrt(e_i' P^-1 e_i) * delta
    P_inv = np.linalg.inv(P)
    x_eq = np.asarray(x_eq)
    deltas = []
    for i in range(P.shape[0]):
        r = np.sqrt(P_inv[i, i])
        if r > 1e-12:
            deltas.append((x_max[i] - x_eq[i]) / r)
            deltas.append((x_eq[i] - x_min[i]) / r)
    KPK = K @ P_inv @ K.T
    u_eq_fb = np.asarray(u_eq)
    for i in range(K.shape[0]):
        r = np.sqrt(KPK[i, i])
        if r > 1e-12:
            deltas.append((u_max[i] - u_eq_fb[i]) / r)
            deltas.append((u_eq_fb[i] - u_min[i]) / r)
    delta = float(max(min(deltas), 0.0)) if deltas else 0.0
    return TerminalSet(P=P, K=K, delta=delta, rho=float(rho))
