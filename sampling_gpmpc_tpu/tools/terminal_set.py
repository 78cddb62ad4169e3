"""Terminal set / ancillary gain synthesis (E2).

Produces the (P, K, delta, rho) terminal ingredients consumed by the YAML
configs.  The reference solves a min -logdet LMI with cvxpy over gridded
(A, B) vertices (ref: extra/pendulum_mpi.py:106-165, car_mpi.py:14-60).
Two synthesis routes are provided here:

- ``synthesize_lmi``: the reference's SDP itself — max logdet E subject to
  the vertex contraction LMIs — solved from scratch with a log-barrier
  Newton method in JAX (no cvxpy in this image).
- ``synthesize``: the classical Riccati route, which *verifies* the same
  contraction and constraint-containment conditions a posteriori over
  sampled vertices:

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


# ---------------------------------------------------------------------------
# min -logdet LMI synthesis (the reference's cvxpy SDP, re-implemented as a
# log-barrier Newton method; ref: extra/pendulum_mpi.py:106-165,
# car_mpi.py:14-60).  The problem is a MAXDET program over
#     E (nx,nx) PSD,  Y (nu,nx):
#   max  logdet E
#   s.t. [[rho^2 E, (A_v E + B_v Y)'], [A_v E + B_v Y, E]] >= 0   per vertex
#        a_i' E a_i <= b_i^2                                      state rows
#        [[b_u^2, a_u' Y], [Y' a_u, E]] >= 0                      input rows
# Variables number ~nx(nx+1)/2 + nu*nx (<= ~20 for the shipped envs), so a
# dense damped-Newton barrier method with jax.hessian is exact and instant —
# no external SDP solver needed.


def vertex_jacobians(env: Env, pts) -> list:
    """(A, B) true-dynamics Jacobians at sampled (nx+nu,) points — the
    vertex set the reference builds from sampled GP gradients
    (ref: pendulum_mpi.py:33-57)."""
    spec = env.spec
    out = []
    for xu in np.asarray(pts):
        dg = env.g_prior(env.g_inputs(jnp.asarray(xu)))
        comb = np.asarray(env.assemble_val_jac(jnp.asarray(xu), dg))
        out.append((comb[:, 1:1 + spec.nx], comb[:, 1 + spec.nx:]))
    return out


def _vech_indices(n):
    return np.triu_indices(n)


def synthesize_lmi(env: Env, x_eq, u_eq, rho: float, x_min, x_max,
                   u_min, u_max, vertices=None, mu_final: float = 1e-7,
                   newton_iters: int = 60) -> TerminalSet:
    """Maximum-volume invariant ellipse {(x-xe)' P (x-xe) <= 1} with gain K.

    Where :func:`synthesize` picks the Riccati P and only VERIFIES the
    certificate, this OPTIMIZES the set volume subject to it, like the
    reference's SDP.  Returns TerminalSet(P=E^-1, K=Y E^-1, delta=1, rho).
    """
    from sampling_gpmpc_tpu.setup import enable_x64
    enable_x64()

    nx, nu = env.spec.nx, env.spec.nu
    x_eq = np.asarray(x_eq, dtype=np.float64)
    u_eq = np.asarray(u_eq, dtype=np.float64)
    AB = (vertex_jacobians(env, vertices) if vertices is not None
          else vertex_jacobians(env, np.concatenate([x_eq, u_eq])[None]))
    A_list = jnp.asarray(np.stack([ab[0] for ab in AB]))
    B_list = jnp.asarray(np.stack([ab[1] for ab in AB]))

    # axis-aligned box rows around the equilibrium
    bx = np.minimum(np.asarray(x_max, np.float64) - x_eq,
                    x_eq - np.asarray(x_min, np.float64))
    bu = np.minimum(np.asarray(u_max, np.float64) - u_eq,
                    u_eq - np.asarray(u_min, np.float64))
    bx = jnp.asarray(bx)
    bu = jnp.asarray(bu)

    iu, ju = _vech_indices(nx)
    n_e = len(iu)

    def unpack(z):
        E = jnp.zeros((nx, nx)).at[iu, ju].set(z[:n_e])
        E = E + E.T - jnp.diag(jnp.diag(E))
        Y = z[n_e:].reshape(nu, nx)
        return E, Y

    def logdet_psd(M):
        """logdet via Cholesky; NaN outside the cone (line search rejects)."""
        L = jnp.linalg.cholesky(M)
        return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))

    rho2 = float(rho) ** 2

    def barrier(z, mu):
        E, Y = unpack(z)
        f = -logdet_psd(E)

        def contraction_block(A, B):
            AEBY = A @ E + B @ Y
            return jnp.block([[rho2 * E, AEBY.T], [AEBY, E]])

        lmi = jax.vmap(contraction_block)(A_list, B_list)
        f = f - mu * jnp.sum(jax.vmap(logdet_psd)(lmi))
        # state rows: slack s_i = b_i^2 - E_ii  (a_i = e_i)
        f = f - mu * jnp.sum(jnp.log(bx * bx - jnp.diagonal(E)))
        # input rows: Schur scalar  b_u^2 - a_u' Y E^-1 Y' a_u >= 0
        Esolve = jnp.linalg.solve(E, Y.T)
        quad = jnp.diagonal(Y @ Esolve)          # (nu,)
        f = f - mu * jnp.sum(jnp.log(bu * bu - quad))
        return f

    grad = jax.jit(jax.grad(barrier))
    hess = jax.jit(jax.hessian(barrier))
    val = jax.jit(barrier)

    # strictly feasible start: a small copy of the RICCATI ellipse
    # E = c P0^-1 with the Riccati gain.  (With Y = K E the contraction
    # block reduces to ||E^-1/2 (A+BK) E^1/2|| <= rho, so the start's
    # shape matters: a ball tests the raw spectral norm, which exceeds 1
    # for perfectly stable closed loops — the P-weighted norm is the one
    # the certificate bounds.)  Shrink c until every barrier is finite.
    ts0 = synthesize(env, x_eq, u_eq, np.eye(nx), np.eye(nu),
                     np.asarray(x_min), np.asarray(x_max),
                     np.asarray(u_min), np.asarray(u_max),
                     vertices=vertices)
    P0_inv = np.linalg.inv(ts0.P)
    P0_inv = P0_inv / np.linalg.norm(P0_inv, 2)
    c = 1e-2 * float(jnp.min(bx) ** 2)
    z = None
    for _ in range(40):
        E0 = c * P0_inv
        Y0 = np.asarray(ts0.K) @ E0
        cand = np.concatenate([E0[iu, ju], Y0.ravel()])
        if np.isfinite(float(val(jnp.asarray(cand), 1.0))):
            z = jnp.asarray(cand)
            break
        c *= 0.5
    if z is None:
        raise ValueError(
            "no strictly feasible start: the Riccati gain does not achieve "
            f"the requested contraction rho={rho} on the vertex set "
            f"(its P-weighted vertex rho is {ts0.rho:.4f}); pass a larger "
            "rho or a tighter vertex set")

    mu = 1.0
    while mu >= mu_final:
        for _ in range(newton_iters):
            g = grad(z, mu)
            H = hess(z, mu)
            H = H + 1e-10 * jnp.eye(H.shape[0])
            step = jnp.linalg.solve(H, g)
            # backtracking: stay strictly inside every cone
            t, f0 = 1.0, float(val(z, mu))
            for _ls in range(50):
                z_new = z - t * step
                f_new = float(val(z_new, mu))
                if np.isfinite(f_new) and f_new < f0 + 1e-12:
                    break
                t *= 0.5
            else:
                break
            z = z_new
            if float(jnp.dot(g, step)) < 1e-10:
                break
        mu *= 0.1

    E, Y = unpack(z)
    E = np.asarray(E)
    P = np.linalg.inv(E)
    K = np.asarray(Y) @ P
    # a-posteriori contraction over the vertex set (certificate check)
    w, V = np.linalg.eigh(P)
    P_half = V @ np.diag(np.sqrt(w)) @ V.T
    P_half_inv = V @ np.diag(1.0 / np.sqrt(w)) @ V.T
    rho_chk = 0.0
    for A, B in AB:
        rho_chk = max(rho_chk, np.linalg.norm(
            P_half @ (A + B @ K) @ P_half_inv, 2))
    return TerminalSet(P=P, K=K, delta=1.0, rho=float(rho_chk))
