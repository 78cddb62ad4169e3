"""Pendulum1D: scalar GP on (theta, u), known kinematic integrator.

Decomposition (ref: src/environments/pendulum1D.py):
    known part   theta+ = theta + omega*dt ; omega+ = omega
    unknown part d_omega = -g*sin(theta)*dt/l + u*dt        (GP input (theta, u))
    B_d = [0, 1]^T, g_idx_inputs = [0, 2], pad_g = [0, 1, 3]
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sampling_gpmpc_tpu.config import ProblemSpec
from sampling_gpmpc_tpu.envs.base import Env, grid_training_data, identity_transform


# GP input filter / jacobian scatter slots (ref: src/environments/pendulum1D.py:15-16)
G_IDX_INPUTS = (0, 2)
PAD_G = (0, 1, 3)


def make(spec: ProblemSpec, params: dict) -> Env:
    ep = params["env"]["params"]
    length, grav = float(ep["l"]), float(ep["g"])
    dt = spec.dt
    nx, nu = spec.nx, spec.nu

    def f_val_jac(xu):
        theta, omega = xu[0], xu[1]
        # rows: [value, d/dtheta, d/domega, d/du]
        return jnp.stack([
            jnp.stack([theta + omega * dt, 1.0 + 0 * theta, dt + 0 * theta, 0 * theta]),
            jnp.stack([omega, 0 * theta, 1.0 + 0 * theta, 0 * theta]),
        ])

    def g_val(z):
        theta, u = z[0], z[1]
        return jnp.stack([-grav * jnp.sin(theta) * dt / length + u * dt])

    def g_prior(z):
        theta = z[0]
        # (g_ny=1, 1+D): [value, d/dtheta, d/du] (ref: pendulum1D.py:58-84)
        return jnp.stack([jnp.stack([
            g_val(z)[0],
            -grav * jnp.cos(theta) * dt / length,
            dt + 0 * theta,
        ])])

    B = np.zeros((nx, spec.g_ny))
    B[1, 0] = 1.0
    B_const = jnp.asarray(B)

    def B_d(xu):
        return B_const.astype(xu.dtype)

    def training_grid():
        opt = params["optimizer"]
        x1 = np.linspace(opt["x_min"][0], opt["x_max"][0], params["env"]["n_data_x"])
        u = np.linspace(opt["u_min"][0], opt["u_max"][0], params["env"]["n_data_u"])
        return grid_training_data(spec, [x1, u], g_prior)

    return Env(spec=spec, f_val_jac=f_val_jac, g_val=g_val, g_prior=g_prior,
               B_d=B_d, transform_sensitivity=identity_transform,
               training_grid=training_grid)
