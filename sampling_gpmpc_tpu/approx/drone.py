"""Planar-quadrotor (drone) environment for the approximate sampling MPC.

Pure-JAX port of the reference drone model (ref:
extra/approx_sampling_mpc/src/environments/drone.py): fully-unknown
discrete dynamics modeled by per-output Bayesian linear regression over
hand-crafted feature maps.  States (px, py, phi, vx, vy, phidot),
inputs (u1, u2).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DroneModel:
    params: dict
    nx: int = 6
    nu: int = 2

    @property
    def phys(self):
        return self.params["env"]["params"]

    def discrete_dyn(self, x, u):
        """True discrete dynamics (ref: drone.py:125-144)."""
        p = self.phys
        m, l, g, d, J = (p["m"], p["l"], p["g"], p["d"], p["J"])
        dt = self.params["optimizer"]["dt"]
        px, py, phi, vx, vy, pd = x
        u1, u2 = u
        return jnp.stack([
            px + (vx * jnp.cos(phi) - vy * jnp.sin(phi)) * dt,
            py + (vx * jnp.sin(phi) + vy * jnp.cos(phi)) * dt,
            phi + pd * dt,
            vx + (vy * pd - g * jnp.sin(phi) + jnp.cos(phi) * d) * dt,
            vy + (-vx * pd - g * jnp.cos(phi) + u1 / m + u2 / m
                  - jnp.sin(phi) * d) * dt,
            pd + (u1 - u2) * l / J * dt,
        ])

    def features(self) -> List[Callable]:
        """Per-output feature maps phi_j(x, u) (ref: drone.py:333-349)."""
        def f_px(x, u):
            return jnp.stack([x[0], x[3] * jnp.cos(x[2]), x[4] * jnp.sin(x[2])])

        def f_py(x, u):
            return jnp.stack([x[1], x[3] * jnp.sin(x[2]), x[4] * jnp.cos(x[2])])

        def f_phi(x, u):
            return jnp.stack([x[2], x[5]])

        def f_vx(x, u):
            return jnp.stack([x[3], x[4] * x[5], jnp.sin(x[2]), jnp.cos(x[2])])

        def f_vy(x, u):
            return jnp.stack([x[4], x[3] * x[5], jnp.cos(x[2]),
                              jnp.sin(x[2]), u[0], u[1]])

        def f_phidot(x, u):
            return jnp.stack([x[5], u[0], u[1]])

        return [f_px, f_py, f_phi, f_vx, f_vy, f_phidot]

    def gt_weights(self) -> List[np.ndarray]:
        """Ground-truth feature weights (ref: drone.py:146-160)."""
        p = self.phys
        m, l, g, d, J = (p["m"], p["l"], p["g"], p["d"], p["J"])
        dt = self.params["optimizer"]["dt"]
        return [np.array(w) for w in [
            [1.0, dt, -dt],
            [1.0, dt, dt],
            [1.0, dt],
            [1.0, dt, -g * dt, d * dt],
            [1.0, -dt, -g * dt, -d * dt, dt / m, dt / m],
            [1.0, dt * l / J, -dt * l / J],
        ]]

    def training_grid(self) -> Tuple[np.ndarray, np.ndarray]:
        """Tensor-grid training data over (x, u) (ref: drone.py:29-64)."""
        opt = self.params["optimizer"]
        n_x = self.params["env"]["n_data_x"]
        n_u = self.params["env"]["n_data_u"]
        axes = [np.linspace(opt["x_min"][i], opt["x_max"][i], n_x)
                for i in range(self.nx)]
        axes += [np.linspace(opt["u_min"][i], opt["u_max"][i], n_u)
                 for i in range(self.nu)]
        mesh = np.meshgrid(*axes, indexing="ij")
        XU = np.stack([m.reshape(-1) for m in mesh], axis=1)

        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            Y = np.array(jax.jit(jax.vmap(
                lambda z: self.discrete_dyn(z[:self.nx], z[self.nx:])))(
                jnp.asarray(XU)))
        return XU, Y

    def path_generator(self, st: int, length: int = None) -> np.ndarray:
        """Heart-curve reference path (ref: drone.py:626-638)."""
        if length is None:
            length = self.params["optimizer"]["H"] + 1
        s = np.linspace(0, 4 * np.pi, 1000)
        t = s[st:st + length]
        x = 8 * np.sin(t) ** 3 / 1.5 + 1
        y = (10 * np.cos(t) - 5 * np.cos(2 * t) - 2 * np.cos(3 * t)
             - np.cos(4 * t)) / 2
        return np.stack([x, y], axis=1)

    def obstacles(self) -> np.ndarray:
        obs = self.params["env"].get("obstacles", {}) or {}
        return np.asarray([obs[k] for k in obs], dtype=np.float64).reshape(-1, 3)
