"""2-process jax.distributed worker for test_distributed.py.

Each process owns 4 virtual CPU devices (8 global over DCN-emulating gloo
collectives); both run the ORDERED sample-sharded SQP solve on the global
mesh — the real multi-host path of parallel/distributed.py::init_multihost
+ parallel/sharded.py::make_sharded_solve, the in-image stand-in for the
2-host TPU pod-slice deployment (SURVEY §2.4; ref: the reference's
SLURM-array scale-out, benchmarking/euler_job.sh).

Invoked as:  python distributed_worker.py <pid> <nproc> <port> <out.npz>
"""

import os
import sys


def main() -> None:
    pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")

    from sampling_gpmpc_tpu.parallel import distributed
    assert distributed.init_multihost(
        coordinator=f"127.0.0.1:{port}", num_processes=nproc,
        process_id=pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc

    from sampling_gpmpc_tpu.setup import enable_x64
    enable_x64()

    import dataclasses

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from sampling_gpmpc_tpu import agent as agent_mod
    from sampling_gpmpc_tpu.config import load_problem
    from sampling_gpmpc_tpu.envs import make_env
    from sampling_gpmpc_tpu.gp.exact import GPHyperArrays
    from sampling_gpmpc_tpu.ocp import sqp
    from sampling_gpmpc_tpu.ocp.spec import make_ocp_data
    from sampling_gpmpc_tpu.parallel.sharded import make_sharded_solve

    # host-side setup must run on a LOCAL device: in multi-process mode the
    # global default device (jax.devices()[0]) is non-addressable from
    # process 1 and un-annotated jits would land there
    with jax.default_device(jax.local_devices()[0]):
        params, spec, data = load_problem(
            os.path.join(repo, "params", "params_pendulum1D_samples.yaml"))
        spec = dataclasses.replace(spec, ns=16, num_mpc_iter=1,
                                   max_sqp_iter=3, tol_nlp=0.0)
        params["agent"]["num_dyn_samples"] = 16
        env = make_env(spec, params)
        dtype = jnp.float64
        ocp = make_ocp_data(spec, data, dtype)
        hyp = GPHyperArrays.from_spec(spec.gp, dtype)
        gp = agent_mod.init_gp_state(spec, env, dtype)
        X, U = sqp.init_iterate(spec, dtype, data.start)
        eps = agent_mod.make_epistemic(jax.random.PRNGKey(spec.seed), spec,
                                       dtype)[0]
        st = jnp.asarray(data.start, dtype)
        gp = jax.tree_util.tree_map(np.asarray, gp)

    mesh = Mesh(np.asarray(jax.devices()), ("ns",))

    def gput(x, pspec):
        x = np.asarray(x)
        sh = NamedSharding(mesh, pspec)
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])

    axis = "ns"
    gp_g = agent_mod.GPState(
        real_Z=gput(gp.real_Z, P()), real_Y=gput(gp.real_Y, P()),
        real_fact={k: gput(v, P()) for k, v in gp.real_fact.items()},
        hall_Z=gput(gp.hall_Z, P(axis)), hall_Y=gput(gp.hall_Y, P(axis)),
        hall_n=gput(gp.hall_n, P()))
    ocp_g = type(ocp)(*[gput(v, P(axis) if name == "w_cost" else P())
                        for name, v in zip(ocp._fields, ocp)])

    solve = make_sharded_solve(spec, env, hyp, ocp_g, mesh, ordered=True)
    out = solve(gput(st, P()), gput(X, P(None, axis)), gput(U, P()),
                gp_g, gput(eps, P(None, axis)))
    U_out = np.asarray(out.U.addressable_data(0))
    it = int(out.it.addressable_data(0))
    status = int(out.status.addressable_data(0))
    # hall_Y is sample-sharded: gather this process's shards for the check
    from jax.experimental import multihost_utils
    hall_Y = np.asarray(multihost_utils.process_allgather(
        out.gp.hall_Y, tiled=True))

    if pid == 0:
        np.savez(out_path, U=U_out, it=it, status=status, hall_Y=hall_Y)
    # both processes print a parseable line for the test's sanity check
    print(f"WORKER_OK pid={pid} it={it} status={status}", flush=True)


if __name__ == "__main__":
    main()
