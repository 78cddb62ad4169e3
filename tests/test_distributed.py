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


def test_two_process_distributed_solve(tmp_path):
    """REAL 2-process jax.distributed run (gloo CPU collectives standing in
    for DCN): both processes initialize through init_multihost, build the
    global 8-device mesh (4 local devices each) and run the ORDERED
    sample-sharded SQP solve; the result must match the single-process
    blocked reference to the ordered-collectives tolerance.  This is the
    in-image evidence that the multi-host path (SURVEY §2.4, the
    reference's SLURM scale-out) initializes, communicates, and computes
    the same answer across process boundaries."""
    import dataclasses
    import os
    import socket
    import subprocess
    import sys

    import jax.numpy as jnp
    import numpy as np

    from sampling_gpmpc_tpu import agent as agent_mod
    from sampling_gpmpc_tpu.config import load_problem
    from sampling_gpmpc_tpu.envs import make_env
    from sampling_gpmpc_tpu.gp.exact import GPHyperArrays
    from sampling_gpmpc_tpu.ocp import sqp
    from sampling_gpmpc_tpu.ocp.spec import make_ocp_data
    from sampling_gpmpc_tpu.parallel.sharded import make_blocked_solve

    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "distributed_worker.py")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    out_npz = str(tmp_path / "dist_out.npz")

    env_base = {k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port), out_npz],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env_base) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"WORKER_OK pid={pid}" in out

    got = np.load(out_npz)
    assert int(got["status"]) == 0 and int(got["it"]) == 3

    # single-process blocked reference: same per-block partials, same
    # ordered reductions (the worker's problem setup, mirrored)
    pdir = os.path.join(os.path.dirname(here), "params")
    params, spec, data = load_problem(
        os.path.join(pdir, "params_pendulum1D_samples.yaml"))
    spec = dataclasses.replace(spec, ns=16, num_mpc_iter=1, max_sqp_iter=3,
                               tol_nlp=0.0)
    params["agent"]["num_dyn_samples"] = 16
    env = make_env(spec, params)
    dtype = jnp.float64
    ocp = make_ocp_data(spec, data, dtype)
    hyp = GPHyperArrays.from_spec(spec.gp, dtype)
    gp = agent_mod.init_gp_state(spec, env, dtype)
    X, U = sqp.init_iterate(spec, dtype, data.start)
    eps = agent_mod.make_epistemic(jax.random.PRNGKey(spec.seed), spec,
                                   dtype)[0]
    ref = make_blocked_solve(spec, env, hyp, ocp, 8)(
        jnp.asarray(data.start, dtype), X, U, gp, eps)
    np.testing.assert_allclose(got["U"], np.asarray(ref.U), atol=1e-6)
    hall = np.abs(got["hall_Y"] - np.asarray(ref.gp.hall_Y))
    assert np.nanmax(hall) < 1e-6
