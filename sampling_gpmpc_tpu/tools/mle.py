"""GP hyperparameter fitting by marginal-likelihood maximization (E4).

Replaces the reference's GPyTorch Adam MLE scripts (ref: extra/mle_car.py,
mle_pendulum.py, mle_pendulum1D.py) with an optax Adam loop over the
masked-observation marginal likelihood of the derivative GP — the fitted
(lengthscale, outputscale, task noises) drop into the YAML config fields
Dyn_gp_lengthscale/outputscale/task_noises.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sampling_gpmpc_tpu.gp.kernel import kernel_matrix


def masked_nll(Z, Y, log_ls, log_os, log_noise, with_grad: bool):
    """Negative log marginal likelihood with NaN-masked observations.

    Args:
        Z: (M, D); Y: (M, Ty) with NaN for missing entries.
        log_ls: (D,); log_os: (); log_noise: (Ty,).
    """
    M, Ty = Y.shape
    y = Y.reshape(-1)
    m = (~jnp.isnan(y)).astype(Z.dtype)
    y = jnp.nan_to_num(y)

    K = kernel_matrix(Z, Z, jnp.exp(log_ls), jnp.exp(log_os), with_grad)
    K = K + jnp.diag(jnp.tile(jnp.exp(log_noise), M))
    Km = m[:, None] * K * m[None, :] + jnp.diag(1.0 - m)
    L = jnp.linalg.cholesky(Km + 1e-10 * jnp.eye(Km.shape[0], dtype=Z.dtype))
    alpha = jax.scipy.linalg.cho_solve((L, True), m * y)
    # masked rows contribute log(1) = 0 to the determinant and 0 to the fit
    return (0.5 * jnp.dot(m * y, alpha)
            + jnp.sum(jnp.log(jnp.diagonal(L)) * 1.0)
            + 0.5 * jnp.sum(m) * jnp.log(2 * jnp.pi))


def fit_gp_hyperparameters(Z, Y, with_grad: bool = True, iters: int = 300,
                           lr: float = 5e-2, init: Dict = None,
                           verbose: bool = False) -> Dict:
    """Fit one output's hyperparameters by Adam on the NLL.

    Args:
        Z: (M, D) inputs; Y: (M, Ty) observations (NaN-masked).
    Returns:
        dict with lengthscale (D,), outputscale (), task_noises (Ty,),
        and the final nll.
    """
    Z = jnp.asarray(Z)
    Y = jnp.asarray(Y)
    D = Z.shape[1]
    Ty = Y.shape[1]
    init = init or {}
    params = {
        "log_ls": jnp.log(jnp.asarray(init.get("lengthscale",
                                               np.ones(D)), Z.dtype)),
        "log_os": jnp.log(jnp.asarray(init.get("outputscale", 1.0), Z.dtype)),
        "log_noise": jnp.log(jnp.asarray(init.get("task_noises",
                                                  1e-4 * np.ones(Ty)),
                                         Z.dtype)),
    }

    loss = lambda p: masked_nll(Z, Y, p["log_ls"], p["log_os"],
                                p["log_noise"], with_grad)
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        val, grads = jax.value_and_grad(loss)(params)
        updates, state = opt.update(grads, state)
        return optax.apply_updates(params, updates), state, val

    for i in range(iters):
        params, state, val = step(params, state)
        if verbose and i % 50 == 0:
            print(f"iter {i}: nll {float(val):.4f}")

    return {
        "lengthscale": np.exp(np.asarray(params["log_ls"])),
        "outputscale": float(np.exp(params["log_os"])),
        "task_noises": np.exp(np.asarray(params["log_noise"])),
        "nll": float(val),
    }


def fit_env_gp(env, spec, **kwargs) -> Tuple[list, list]:
    """Fit all g_ny outputs of an environment's prior training data."""
    X, Y = env.training_grid()
    out = []
    for j in range(spec.g_ny):
        out.append(fit_gp_hyperparameters(X, Y[j], **kwargs))
    return out
