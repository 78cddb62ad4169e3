"""Sample-axis-sharded SQP solve via shard_map.

The full SQP-RTI body of ocp/sqp.py runs shard-local on ns/n_dev samples per
device; the only cross-chip communication per SQP iteration is

  * one psum of the condensed (nU, nU) input Hessian + (nU,) gradient,
  * per-PDIP-iteration psums of the (nz, nz) Schur complement and a few
    scalars (step lengths, residuals, complementarity),
  * scalar psums for the convergence norms,

replacing the reference's single-GPU batching and SLURM-array scale-out
(ref: benchmarking/euler_job.sh, SURVEY §2.4).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from sampling_gpmpc_tpu.agent import GPState
from sampling_gpmpc_tpu.config import ProblemSpec
from sampling_gpmpc_tpu.ocp import sqp


def make_sharded_solve(spec: ProblemSpec, env, hyp, ocp, mesh: Mesh,
                       axis: str = "ns"):
    """Build a jitted, ns-sharded version of ocp.sqp.solve.

    The per-shard body sees a spec with the *local* sample count; arrays are
    partitioned as: X on its sample axis, GP hallucination buffers on their
    leading sample axis, epistemic draws on theirs; everything else
    replicated.  Outputs mirror the input partitioning.
    """
    n_dev = mesh.shape[axis]
    assert spec.ns % n_dev == 0, (
        f"num_dyn_samples={spec.ns} must divide over {n_dev} devices")
    local_spec = dataclasses.replace(spec, ns=spec.ns // n_dev)

    gp_spec = GPState(real_Z=P(), real_Y=P(),
                      real_fact={"L": P(), "w": P(), "mask": P()},
                      hall_Z=P(axis), hall_Y=P(axis), hall_n=P())
    # QP warm-start state: dU replicated, constraint-row quantities are
    # shard-local (each shard owns its samples' rows)
    ws_spec = (P(),) + (P(axis),) * 10
    state_spec = sqp.SolveState(
        X=P(None, axis), U=P(), X_prev=P(None, axis), U_prev=P(),
        gp=gp_spec, it=P(), status=P(), done=P(),
        qp_ws=ws_spec, qp_valid=P(), qp_iters=P(), qp_gap=P())

    # OCPData: only the per-sample cost weights are sharded
    ocp_specs = type(ocp)(*([P()] * len(ocp)))._replace(w_cost=P(axis))

    def body(st_curr, X0, U0, gp0, eps_iters, ocp_l):
        return sqp.solve(local_spec, env, hyp, ocp_l, st_curr, X0, U0, gp0,
                         eps_iters, axis_name=axis)

    kwargs = dict(
        mesh=mesh,
        in_specs=(P(), P(None, axis), P(), gp_spec, P(None, axis), ocp_specs),
        out_specs=state_spec,
    )
    try:
        mapped = shard_map(body, check_vma=False, **kwargs)
    except TypeError:  # older jax spells it check_rep
        mapped = shard_map(body, check_rep=False, **kwargs)
    jitted = jax.jit(mapped)
    return lambda st_curr, X0, U0, gp0, eps_iters: jitted(
        st_curr, X0, U0, gp0, eps_iters, ocp)


def make_sharded_rollout(spec: ProblemSpec, env, hyp, mesh: Mesh,
                         axis: str = "ns", use_feedback=None):
    """ns-sharded forward-sampling reachability rollout.

    Realizations are fully independent (no collectives at all): this is
    the reference's 2500-SLURM-job workload as one sharded array program
    (ref: benchmarking/euler_job.sh, simulate_forward_sampling_car.py).
    The per-shard key is folded with the shard index so realization draws
    stay independent across devices.
    """
    import jax.numpy as jnp

    from sampling_gpmpc_tpu.reachability import forward_sample_rollout

    n_dev = mesh.shape[axis]
    assert spec.ns % n_dev == 0
    local_spec = dataclasses.replace(spec, ns=spec.ns // n_dev)
    gp_spec = GPState(real_Z=P(), real_Y=P(),
                      real_fact={"L": P(), "w": P(), "mask": P()},
                      hall_Z=P(axis), hall_Y=P(axis), hall_n=P())

    def body(gp0, x0, U, key):
        shard_key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        X, gp = forward_sample_rollout(local_spec, env, hyp, gp0, x0, U,
                                       shard_key, use_feedback=use_feedback)
        return X, gp

    kwargs = dict(
        mesh=mesh,
        in_specs=(gp_spec, P(), P(), P()),
        out_specs=(P(None, axis), gp_spec),
    )
    try:
        mapped = shard_map(body, check_vma=False, **kwargs)
    except TypeError:
        mapped = shard_map(body, check_rep=False, **kwargs)
    return jax.jit(mapped)
