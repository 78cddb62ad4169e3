"""Environment protocol: dynamics decomposition as pure JAX functions.

Every environment implements the decomposition used by the reference
(SURVEY §2.1-C12, duck-typed protocol of src/environments/*):

    x_{k+1} = f_known(x, u) + B_d(x) @ g(x_g, u_g)

where ``g`` is the unknown part modeled by the GP, evaluated on the filtered
inputs ``(x, u)[g_idx_inputs]``.  Unlike the reference's stateful torch
classes, an :class:`Env` here is a frozen bundle of *pure* per-point
functions; batching is always done with ``jax.vmap`` / broadcasting at the
call site, which is what XLA wants.

Conventions (per point):
    xu        : (nx+nu,) concatenated state-input
    f_val_jac : (nx, 1+nx+nu)  — per next-state row: [value, d/dx…, d/du…]
    g_val     : (D,) -> (g_ny,)
    g_prior   : (D,) -> (g_ny, 1+D) — analytic value+gradient (the oracle the
                GP is trained on, and the ``true_dyn_as_sample`` override)
    B_d       : (nx+nu,) -> (nx, g_ny)
    transform_sensitivity : sampled (g_ny, Ty) GP outputs -> (g_ny, P) rows
                scattered into pad_g slots of the (1+nx+nu) jacobian layout
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax.numpy as jnp
import numpy as np

from sampling_gpmpc_tpu.config import ProblemSpec


@dataclasses.dataclass(frozen=True)
class Env:
    spec: ProblemSpec
    f_val_jac: Callable            # (nx+nu,) -> (nx, 1+nx+nu)
    g_val: Callable                # (D,) -> (g_ny,)
    g_prior: Callable              # (D,) -> (g_ny, 1+D)
    B_d: Callable                  # (nx+nu,) -> (nx, g_ny), used in jacobian
    #   assembly; for the residual car this is the *constant* identity — the
    #   state-dependent v-scaling lives in transform_sensitivity
    #   (ref: car_model_residual.py:26 vs :184-186).
    transform_sensitivity: Callable  # ((g_ny, Ty), (nx+nu,)) -> (g_ny, |pad_g|)
    training_grid: Callable        # () -> (X (N, D), Y (g_ny, N, 1+D)) numpy
    B_d_dyn: Callable = None       # true-dynamics disturbance matrix; defaults
    #   to B_d (ref: *.unknown_dyn_Bd_fun)

    def __post_init__(self):
        if self.B_d_dyn is None:
            object.__setattr__(self, "B_d_dyn", self.B_d)

    def g_inputs(self, xu: jnp.ndarray) -> jnp.ndarray:
        """Filter full (…, nx+nu) points down to the GP input dims."""
        return xu[..., jnp.asarray(self.spec.g_idx_inputs)]

    def discrete_dyn(self, x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        """True plant step for a single (x, u) (ref: *.discrete_dyn)."""
        xu = jnp.concatenate([x, u])
        f = self.f_val_jac(xu)[:, 0]
        g = self.g_val(self.g_inputs(xu))
        return f + self.B_d_dyn(xu) @ g

    def assemble_val_jac(self, xu: jnp.ndarray, dg: jnp.ndarray) -> jnp.ndarray:
        """Combine known jacobian with (transformed, padded) GP outputs.

        Replaces the reference's pad/B_d matmul pipeline
        (ref: src/agent.py:532-564).

        Args:
            xu: (nx+nu,) linearization point.
            dg: (g_ny, Ty) sampled GP value(+gradient) rows.
        Returns:
            (nx, 1+nx+nu) combined [value, d/dx, d/du] rows.
        """
        spec = self.spec
        tg = self.transform_sensitivity(dg, xu)      # (g_ny, |pad_g|)
        pad = jnp.zeros((spec.g_ny, 1 + spec.nx + spec.nu), tg.dtype)
        pad = pad.at[:, jnp.asarray(spec.pad_g)].set(tg)
        return self.f_val_jac(xu) + self.B_d(xu) @ pad


def identity_transform(dg: jnp.ndarray, xu: jnp.ndarray) -> jnp.ndarray:
    """Pass-through sensitivity transform (pendulum/pendulum1D/full car)."""
    return dg


def grid_training_data(spec: ProblemSpec, axes, g_prior) -> Tuple[np.ndarray, np.ndarray]:
    """Tensor-grid prior training data (ref: *.initial_training_data).

    Args:
        axes: list of 1-D numpy arrays, one per GP input dim.
        g_prior: per-point analytic prior function.
    Returns:
        X: (N, D); Y: (g_ny, N, 1+D) with gradient entries NaN-ed out when
        the config says training data has no derivatives.
    """
    import jax

    mesh = np.meshgrid(*axes, indexing="ij")
    X = np.stack([m.reshape(-1) for m in mesh], axis=1)
    # evaluate on host CPU in one jitted call: tiny eager ops on a remote
    # accelerator would pay a round-trip compile each.  Must be the LOCAL
    # cpu device: under jax.distributed, jax.devices("cpu")[0] is global
    # device 0, which is non-addressable from processes > 0
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        Y = np.array(jax.jit(jax.vmap(g_prior))(jnp.asarray(X)))  # (N,g_ny,1+D)
    Y = np.transpose(Y, (1, 0, 2))                        # (g_ny, N, 1+D)
    if not spec.train_data_has_derivatives:
        Y[:, :, 1:] = np.nan
    return X, Y
