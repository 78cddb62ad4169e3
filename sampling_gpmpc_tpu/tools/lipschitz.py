"""Closed-loop Lipschitz / contraction constant estimation (E5).

Replaces extra/Lipschitz_constant.py: the YAML constant
``agent.tight.Lipschitz`` is the maximal P-weighted closed-loop Jacobian
norm over a state-input grid,

    L = max_{x, u} || P^{1/2} (A(x,u) - B(x,u) K) P^{-1/2} ||_2 ,

with (A, B) the true-dynamics Jacobians from the environment's analytic
prior (vmapped spectral norms on device).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sampling_gpmpc_tpu.envs.base import Env


def closed_loop_jacobian(env: Env, xu, K):
    """A + B K at one point from the true-dynamics oracle.

    K follows the config convention (the controller applies
    u = -K(x_eq - x), so du/dx = +K; the YAML gains are the *negated*
    DARE gains, e.g. params_pendulum1D_samples.yaml terminal_tightening.K).
    """
    spec = env.spec
    dg = env.g_prior(env.g_inputs(xu))
    comb = env.assemble_val_jac(xu, dg)
    A = comb[:, 1:1 + spec.nx]
    B = comb[:, 1 + spec.nx:]
    return A + B @ K


def estimate_lipschitz(env: Env, P, K, x_grid, u_grid) -> float:
    """Max weighted spectral norm over the grid.

    Args:
        P: (nx, nx) terminal metric; K: (nu, nx) feedback gain.
        x_grid: (N, nx) state samples; u_grid: (N, nu) input samples.
    """
    P = jnp.asarray(P)
    K = jnp.asarray(K)
    w, V = jnp.linalg.eigh(P)
    P_half = V @ jnp.diag(jnp.sqrt(w)) @ V.T
    P_half_inv = V @ jnp.diag(1.0 / jnp.sqrt(w)) @ V.T

    def norm_one(x, u):
        J = closed_loop_jacobian(env, jnp.concatenate([x, u]), K)
        W = P_half @ J @ P_half_inv
        return jnp.linalg.norm(W, ord=2)

    norms = jax.vmap(norm_one)(jnp.asarray(x_grid), jnp.asarray(u_grid))
    return float(jnp.max(norms))


def grid_around(lo, hi, n) -> np.ndarray:
    """Tensor grid between lo and hi with n points per dim, flattened."""
    axes = [np.linspace(l, h, n) for l, h in zip(lo, hi)]
    mesh = np.meshgrid(*axes, indexing="ij")
    return np.stack([m.reshape(-1) for m in mesh], axis=1)
