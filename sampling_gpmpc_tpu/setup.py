"""Runtime setup helpers: dtype policy and platform selection.

The reference runs everything in torch float64 (src/agent.py:15).  On TPU we
default to float32 for throughput benches but support float64 (XLA software
f64) for parity tests; the dtype is chosen once per process.
"""

import os

import jax
import jax.numpy as jnp

_X64_ENABLED = False


def enable_x64() -> None:
    """Enable 64-bit mode globally (idempotent)."""
    global _X64_ENABLED
    if not _X64_ENABLED:
        jax.config.update("jax_enable_x64", True)
        _X64_ENABLED = True


def default_dtype():
    """Process-wide default floating dtype.

    Controlled by ``SGPMPC_DTYPE`` in {float32, float64, bfloat16};
    float64 implies enabling x64.
    """
    name = os.environ.get("SGPMPC_DTYPE", "float64")
    if name == "float64":
        enable_x64()
        return jnp.float64
    if name == "bfloat16":
        return jnp.bfloat16
    return jnp.float32


def force_cpu_mesh(n_devices: int = 8) -> None:
    """Switch this process to a virtual n-device CPU platform (for tests).

    Must be called before any JAX computation runs.  Works even when a
    sitecustomize has already imported jax with a TPU platform, because
    jax defers backend initialisation until first use.
    """
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    )
    jax.config.update("jax_platforms", "cpu")


def full_precision(fn):
    """Trace `fn` under full-f32 matmul precision.

    TPU default matmuls use bf16 passes; IPM Schur complements and GP
    posterior covariances (differences of near-equal matrices) need the
    full-precision path — see CLAUDE.md numerics notes.
    """
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
