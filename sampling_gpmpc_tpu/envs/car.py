"""Kinematic bicycle car, full unknown g on (phi, v, delta).

Decomposition (ref: src/environments/car_model.py):
    state (X, Y, phi, v), input (delta, a)
    known part: X+=X, Y+=Y, phi+=phi, v+ = v + a*dt
    unknown g(phi, v, delta) = [v cos(phi+b) dt, v sin(phi+b) dt, v sin(b) dt/lr],
        b = atan(lr tan(delta) / (lf+lr))
    B_d = I(4x3), g_idx_inputs = [2, 3, 4], pad_g = [0, 3, 4, 5]
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sampling_gpmpc_tpu.config import ProblemSpec
from sampling_gpmpc_tpu.envs.base import Env, grid_training_data, identity_transform


def _beta_terms(delta, lf, lr):
    beta_in = lr * jnp.tan(delta) / (lf + lr)
    beta = jnp.arctan(beta_in)
    # d beta / d delta
    term = ((lr / jnp.cos(delta) ** 2) / (lf + lr)) / (1 + beta_in ** 2)
    return beta, term


def make_f_val_jac(spec: ProblemSpec):
    dt = spec.dt
    nx, nu = spec.nx, spec.nu

    def f_val_jac(xu):
        X, Y, phi, v = xu[0], xu[1], xu[2], xu[3]
        acc = xu[5]
        out = jnp.zeros((nx, 1 + nx + nu), xu.dtype)
        out = out.at[0, 0].set(X).at[0, 1].set(1.0)
        out = out.at[1, 0].set(Y).at[1, 2].set(1.0)
        out = out.at[2, 0].set(phi).at[2, 3].set(1.0)
        out = out.at[3, 0].set(v + acc * dt).at[3, 4].set(1.0).at[3, 6].set(dt)
        return out

    return f_val_jac


# GP input filter / jacobian scatter slots (ref: src/environments/car_model.py:11-12)
G_IDX_INPUTS = (2, 3, 4)
PAD_G = (0, 3, 4, 5)


def make(spec: ProblemSpec, params: dict) -> Env:
    ep = params["env"]["params"]
    lf, lr = float(ep["lf"]), float(ep["lr"])
    dt = spec.dt

    def g_val(z):
        phi, v, delta = z[0], z[1], z[2]
        beta, _ = _beta_terms(delta, lf, lr)
        return jnp.stack([
            v * jnp.cos(phi + beta) * dt,
            v * jnp.sin(phi + beta) * dt,
            v * jnp.sin(beta) * dt / lr,
        ])

    def g_prior(z):
        phi, v, delta = z[0], z[1], z[2]
        beta, term = _beta_terms(delta, lf, lr)
        zero = 0 * phi
        # rows per output: [value, d/dphi, d/dv, d/ddelta]
        # (ref: car_model.py:62-99)
        c, s = jnp.cos(phi + beta), jnp.sin(phi + beta)
        return jnp.stack([
            jnp.stack([v * c * dt, -v * s * dt, c * dt, -v * s * dt * term]),
            jnp.stack([v * s * dt, v * c * dt, s * dt, v * c * dt * term]),
            jnp.stack([v * jnp.sin(beta) * dt / lr, zero, jnp.sin(beta) * dt / lr,
                       v * jnp.cos(beta) * dt * term / lr]),
        ])

    B_const = jnp.asarray(np.eye(spec.nx, spec.g_ny))

    def B_d(xu):
        return B_const.astype(xu.dtype)

    def training_grid():
        opt = params["optimizer"]
        n_x, n_u = params["env"]["n_data_x"], params["env"]["n_data_u"]
        # cell-centered grids (ref: car_model.py:33-47)
        def centered(lo, hi, n):
            d = (hi - lo) / n
            return np.linspace(lo + d / 2, hi - d / 2, n)
        phi = centered(opt["x_min"][2], opt["x_max"][2], n_x)
        v = centered(opt["x_min"][3], opt["x_max"][3], n_x)
        delta = centered(opt["u_min"][0], opt["u_max"][0], n_u)
        return grid_training_data(spec, [phi, v, delta], g_prior)

    return Env(spec=spec, f_val_jac=make_f_val_jac(spec), g_val=g_val,
               g_prior=g_prior, B_d=B_d,
               transform_sensitivity=identity_transform,
               training_grid=training_grid)
