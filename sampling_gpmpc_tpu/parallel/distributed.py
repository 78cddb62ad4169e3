"""Multi-host initialization + seed-axis scale-out helpers.

The reference scales reachability sweeps with 2500 independent SLURM jobs
writing pickles to a shared filesystem (ref: benchmarking/euler_job.sh).
The TPU-native equivalents here are:

* :func:`init_multihost` — `jax.distributed` initialization from standard
  cluster env vars; afterwards `jax.devices()` spans all hosts and the
  global mesh of :mod:`sampling_gpmpc_tpu.parallel.mesh` covers the pod
  slice (sample axis over ICI within a host, DCN across hosts).
* :func:`host_seed_blocks` — deterministic partition of a seed sweep over
  processes for embarrassingly parallel repeat axes (each host runs its
  blocks with the sharded sample axis inside).
"""

from __future__ import annotations

import os
from typing import List

import jax


def init_multihost(coordinator: str = None, num_processes: int = None,
                   process_id: int = None) -> bool:
    """Initialize jax.distributed when a multi-process env is configured.

    Reads standard env vars (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
    JAX_PROCESS_ID; SLURM equivalents are auto-detected by jax). Returns
    True if distributed mode was initialized.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None \
        else _int_env("JAX_PROCESS_ID")
    if coordinator is None and num_processes is None:
        in_slurm = "SLURM_JOB_ID" in os.environ \
            and _int_env("SLURM_NTASKS", 1) > 1
        if not in_slurm:
            return False
        jax.distributed.initialize()
        return True
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id)
    return True


def _int_env(name: str, default=None):
    v = os.environ.get(name)
    return int(v) if v is not None else default


def host_seed_blocks(total_blocks: int) -> List[int]:
    """This process's share of a seed sweep (round-robin over processes)."""
    pid = jax.process_index()
    n = jax.process_count()
    return [b for b in range(total_blocks) if b % n == pid]
