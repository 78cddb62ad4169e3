"""Multi-host helpers: seed-block partition + init gating (B3 scale-out).

The actual multi-host DCN path needs >1 process; what is testable here is
the partition contract every host relies on (disjoint, exhaustive,
deterministic) and that initialization stays inert outside a cluster env.
"""

import jax
import pytest

from sampling_gpmpc_tpu.parallel import distributed


def test_single_process_gets_all_blocks():
    assert distributed.host_seed_blocks(7) == list(range(7))


@pytest.mark.parametrize("n_proc,total", [(2, 10), (3, 8), (5, 4)])
def test_blocks_partition_disjoint_and_exhaustive(monkeypatch, n_proc,
                                                  total):
    shares = []
    for pid in range(n_proc):
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        monkeypatch.setattr(jax, "process_count", lambda n=n_proc: n)
        shares.append(distributed.host_seed_blocks(total))
    flat = [b for s in shares for b in s]
    assert sorted(flat) == list(range(total))        # exhaustive, disjoint
    # balanced to within one block (round-robin)
    sizes = [len(s) for s in shares]
    assert max(sizes) - min(sizes) <= 1


def test_init_multihost_inert_without_cluster_env(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID", "SLURM_JOB_ID", "SLURM_NTASKS"):
        monkeypatch.delenv(var, raising=False)
    assert distributed.init_multihost() is False
