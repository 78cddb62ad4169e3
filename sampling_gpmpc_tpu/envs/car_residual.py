"""Residual bicycle car (`bicycle_Bdx`): velocity-factored unknown part.

Decomposition (ref: src/environments/car_model_residual.py):
    g(phi, delta) = [cos(phi+b) dt, sin(phi+b) dt, sin(b) dt/lr]  (no v!)
    B_d(x) = v * I(4x3)   — state-dependent disturbance input matrix
    g_idx_inputs = [2, 4], pad_g = [0, 3, 4, 5]

The sampled sensitivity (g_ny, [val, d/dphi, d/ddelta]) is transformed to
(g_ny, [val, d/dphi, d/dv, d/ddelta]) by scaling with v and injecting the
d/dv column (= the raw value, since the full residual is v*g):
ref: car_model_residual.py:211-224.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sampling_gpmpc_tpu.config import ProblemSpec
from sampling_gpmpc_tpu.envs.base import Env, grid_training_data
from sampling_gpmpc_tpu.envs.car import _beta_terms, make_f_val_jac


# GP input filter / jacobian scatter slots (ref: src/environments/car_model_residual.py:14-16)
G_IDX_INPUTS = (2, 4)
PAD_G = (0, 3, 4, 5)


def make(spec: ProblemSpec, params: dict) -> Env:
    ep = params["env"]["params"]
    lf, lr = float(ep["lf"]), float(ep["lr"])
    dt = spec.dt

    def g_val(z):
        phi, delta = z[0], z[1]
        beta, _ = _beta_terms(delta, lf, lr)
        return jnp.stack([
            jnp.cos(phi + beta) * dt,
            jnp.sin(phi + beta) * dt,
            jnp.sin(beta) * dt / lr,
        ])

    def g_prior(z):
        phi, delta = z[0], z[1]
        beta, term = _beta_terms(delta, lf, lr)
        zero = 0 * phi
        c, s = jnp.cos(phi + beta), jnp.sin(phi + beta)
        # rows per output: [value, d/dphi, d/ddelta]
        # (ref: car_model_residual.py:62-99)
        return jnp.stack([
            jnp.stack([c * dt, -s * dt, -s * dt * term]),
            jnp.stack([s * dt, c * dt, c * dt * term]),
            jnp.stack([jnp.sin(beta) * dt / lr, zero,
                       jnp.cos(beta) * dt * term / lr]),
        ])

    eye = jnp.asarray(np.eye(spec.nx, spec.g_ny))

    def B_d_const(xu):
        # jacobian-assembly matrix: constant identity; the v-scaling is done
        # by transform_sensitivity (ref: car_model_residual.py:26,211-224)
        return eye.astype(xu.dtype)

    def B_d_dyn(xu):
        # true-dynamics matrix B_d(x) = v * I (ref: car_model_residual.py:184-186)
        return xu[3] * eye.astype(xu.dtype)

    def transform_sensitivity(dg, xu):
        """(g_ny, Ty) -> (g_ny, 4): [v*val, v*dphi, val, v*ddelta]."""
        v = xu[3]
        g_ny = dg.shape[0]
        out = jnp.zeros((g_ny, 4), dg.dtype)
        if dg.shape[-1] == 1:
            # value-only GP: only the value column is meaningful downstream
            # (forward-sampling path); gradient slots stay zero.
            out = out.at[:, 0].set(v * dg[:, 0]).at[:, 2].set(dg[:, 0])
        else:
            out = out.at[:, jnp.asarray([0, 1, 3])].set(v * dg)
            out = out.at[:, 2].set(dg[:, 0])
        return out

    def training_grid():
        opt = params["optimizer"]
        n_x, n_u = params["env"]["n_data_x"], params["env"]["n_data_u"]
        # plain endpoints grid (ref: car_model_residual.py:36-50, d*=0)
        phi = np.linspace(opt["x_min"][2], opt["x_max"][2], n_x)
        delta = np.linspace(opt["u_min"][0], opt["u_max"][0], n_u)
        return grid_training_data(spec, [phi, delta], g_prior)

    return Env(spec=spec, f_val_jac=make_f_val_jac(spec), g_val=g_val,
               g_prior=g_prior, B_d=B_d_const,
               transform_sensitivity=transform_sensitivity,
               training_grid=training_grid, B_d_dyn=B_d_dyn)
