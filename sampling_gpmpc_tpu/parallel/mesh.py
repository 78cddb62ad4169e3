"""Mesh construction helpers for the sample-sharded solver."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def sample_mesh(n_devices: int = None, axis: str = "ns") -> Mesh:
    """1-D mesh over the dynamics-sample axis.

    The ns samples couple only through the shared input (SURVEY §2.4), so a
    single mesh axis over samples is the natural first parallel layout; on
    real hardware it maps onto ICI within a slice and DCN across hosts.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]).reshape(n), (axis,))
