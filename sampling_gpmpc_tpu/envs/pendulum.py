"""Pendulum (2D GP): fully-unknown dynamics, B_d = I.

Decomposition (ref: src/environments/pendulum.py):
    known part zero; the GP models the full discrete map on (x1, x2, u):
        x1+ = x1 + x2*dt
        x2+ = x2 - g*sin(x1)*dt/l + u*dt/l^2
    g_idx_inputs = [0, 1, 2], pad_g = [0, 1, 2, 3]
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sampling_gpmpc_tpu.config import ProblemSpec
from sampling_gpmpc_tpu.envs.base import Env, grid_training_data, identity_transform


# GP input filter / jacobian scatter slots (ref: src/environments/pendulum.py:13-14)
G_IDX_INPUTS = (0, 1, 2)
PAD_G = (0, 1, 2, 3)


def make(spec: ProblemSpec, params: dict) -> Env:
    ep = params["env"]["params"]
    length, grav = float(ep["l"]), float(ep["g"])
    dt = spec.dt
    nx = spec.nx

    def f_val_jac(xu):
        z = 0 * xu[0]
        return jnp.zeros((nx, 1 + spec.nx + spec.nu), xu.dtype) + z

    def g_val(z):
        x1, x2, u = z[0], z[1], z[2]
        return jnp.stack([
            x1 + x2 * dt,
            x2 - grav * jnp.sin(x1) * dt / length + u * dt / (length * length),
        ])

    def g_prior(z):
        x1 = z[0]
        one = 1.0 + 0 * x1
        zero = 0 * x1
        v = g_val(z)
        # rows per output: [value, d/dx1, d/dx2, d/du] (ref: pendulum.py:64-92)
        return jnp.stack([
            jnp.stack([v[0], one, dt * one, zero]),
            jnp.stack([v[1], -grav * jnp.cos(x1) * dt / length, one,
                       dt / (length * length) * one]),
        ])

    B_const = jnp.asarray(np.eye(nx, spec.g_ny))

    def B_d(xu):
        return B_const.astype(xu.dtype)

    def training_grid():
        opt = params["optimizer"]
        n_x, n_u = params["env"]["n_data_x"], params["env"]["n_data_u"]
        x1 = np.linspace(opt["x_min"][0], opt["x_max"][0], n_x)
        x2 = np.linspace(opt["x_min"][1], opt["x_max"][1], n_x)
        u = np.linspace(opt["u_min"][0], opt["u_max"][0], n_u)
        return grid_training_data(spec, [x1, x2, u], g_prior)

    return Env(spec=spec, f_val_jac=f_val_jac, g_val=g_val, g_prior=g_prior,
               B_d=B_d, transform_sensitivity=identity_transform,
               training_grid=training_grid)
