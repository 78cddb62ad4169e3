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
                       axis: str = "ns", ordered: bool = False):
    """Build a jitted, ns-sharded version of ocp.sqp.solve.

    The per-shard body sees a spec with the *local* sample count; arrays are
    partitioned as: X on its sample axis, GP hallucination buffers on their
    leading sample axis, epistemic draws on theirs; everything else
    replicated.  Outputs mirror the input partitioning.

    ``ordered``: use order-defined cross-shard sums (determinism mode,
    parallel/collectives.py) — bit-reproducible across collective
    implementations and exactly matched by :func:`make_blocked_solve`.
    """
    n_dev = mesh.shape[axis]
    assert spec.ns % n_dev == 0, (
        f"num_dyn_samples={spec.ns} must divide over {n_dev} devices")
    local_spec = dataclasses.replace(spec, ns=spec.ns // n_dev)

    gp_spec = GPState(real_Z=P(), real_Y=P(),
                      real_fact={"L": P(), "w": P(), "mask": P(),
                                 "Linv": P(), "alpha": P()},
                      hall_Z=P(axis), hall_Y=P(axis), hall_n=P())
    # QP warm-start state: dU replicated, constraint-row quantities are
    # shard-local (each shard owns its samples' rows)
    ws_spec = (P(),) + (P(axis),) * 10
    state_spec = sqp.SolveState(
        X=P(None, axis), U=P(), X_prev=P(None, axis), U_prev=P(),
        gp=gp_spec, it=P(), status=P(), done=P(),
        qp_ws=ws_spec, qp_valid=P(), qp_iters=P(), qp_gap=P(),
        best_step=P(), stall_count=P(), mono_count=P(), alpha=P())

    # OCPData: only the per-sample cost weights are sharded
    ocp_specs = type(ocp)(*([P()] * len(ocp)))._replace(w_cost=P(axis))

    def body(st_curr, X0, U0, gp0, eps_iters, ocp_l):
        return sqp.solve(local_spec, env, hyp, ocp_l, st_curr, X0, U0, gp0,
                         eps_iters, axis_name=axis, ordered=ordered)

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


def make_blocked_solve(spec: ProblemSpec, env, hyp, ocp, n_blocks: int,
                       axis: str = "ns"):
    """Single-device simulation of the n-block ORDERED sharded solve.

    ``jax.vmap`` over the block axis with the same ``axis_name`` executes
    the identical per-block program (collectives become batch-axis
    reductions; ordered sums run the same all_gather + sequential
    reduction).  Against ``make_sharded_solve(..., ordered=True)`` on an
    n-device mesh this is the same floating-point computation — the
    same-reduction-order single-device reference that makes a tight
    multi-iteration sharded-vs-single-device equivalence check possible
    (plain psum's device order is not reproducible on one device, and
    ulp-level order noise is chaotically amplified by the sampled-GP + QP
    chain).

    Accepts/returns the same global-shape arrays as the sharded solve.
    Per-block copies of replicated quantities (U, status, ...) are reduced
    by taking block 0; they are identical across blocks by construction
    (every block sees the same ordered-collective results), which the
    dryrun asserts bitwise.
    """
    import jax.numpy as jnp

    n = n_blocks
    assert spec.ns % n == 0
    local = spec.ns // n
    local_spec = dataclasses.replace(spec, ns=local)

    def body(st_curr, X0, U0, gp0, eps_iters, ocp_l):
        return sqp.solve(local_spec, env, hyp, ocp_l, st_curr, X0, U0, gp0,
                         eps_iters, axis_name=axis, ordered=True)

    # input block-axis positions mirror make_sharded_solve's PartitionSpecs;
    # all outputs come back with a leading block axis (out_axes=0) — vmap
    # cannot know the replicated ones are block-invariant
    gp_ax = GPState(real_Z=None, real_Y=None,
                    real_fact={"L": None, "w": None, "mask": None,
                               "Linv": None, "alpha": None},
                    hall_Z=0, hall_Y=0, hall_n=None)
    ocp_ax = type(ocp)(*([None] * len(ocp)))._replace(w_cost=0)
    vbody = jax.vmap(body, in_axes=(None, 1, None, gp_ax, 1, ocp_ax),
                     out_axes=0, axis_name=axis)

    def blocked(st_curr, X0, U0, gp0, eps_iters):
        # split the global sample axis into (n, local) blocks where sharded
        def split(a, ax):
            s = a.shape
            return a.reshape(s[:ax] + (n, local) + s[ax + 1:])
        gp_b = gp0._replace(hall_Z=split(gp0.hall_Z, 0),
                            hall_Y=split(gp0.hall_Y, 0))
        st = vbody(st_curr, split(X0, 1), U0, gp_b, split(eps_iters, 1),
                   ocp._replace(w_cost=split(ocp.w_cost, 0)))

        def merge_x(a):      # (n, H+1, local, nx) -> (H+1, ns, nx)
            m = jnp.moveaxis(a, 0, 1)
            return m.reshape(m.shape[:1] + (n * local,) + m.shape[3:])

        def merge0(a):       # (n, per_block, ...) -> (n*per_block, ...)
            return a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])

        first = lambda a: a[0]
        rep = jax.tree_util.tree_map(first, st)
        return rep._replace(
            X=merge_x(st.X), X_prev=merge_x(st.X_prev),
            gp=rep.gp._replace(hall_Z=merge0(st.gp.hall_Z),
                               hall_Y=merge0(st.gp.hall_Y)),
            qp_ws=(st.qp_ws[0][0],) + tuple(merge0(w) for w in st.qp_ws[1:]))

    return jax.jit(blocked)


def make_sharded_closed_loop(spec: ProblemSpec, env, hyp, ocp, mesh: Mesh,
                             axis: str = "ns", ordered: bool = False):
    """W-step receding-horizon closed loop as ONE sharded program.

    What deployment would run on a pod: per MPC step a sample-sharded
    SQP solve (hallucination reset at solve entry, QP dual warm start
    carried across steps), ancillary feedback on u0, the plant step, and
    the warm-start shift — all inside a single ``lax.fori_loop`` under
    ``shard_map``, so the whole window is one XLA computation per chip
    with only the per-iteration collectives of the solve crossing ICI
    (ref loop: src/DEMPC.py:39-80; warm-start semantics:
    src/solver.py:174-189, src/utils/ocp.py:310).

    Args (to the returned callable):
        x0: (nx,) initial physical state; X0, U0: initial iterate;
        gp0: GPState; eps_all: (W, max_sqp, ns, g_ny, H, Ty) draws.
    Returns the final ``(x, X, U, gp)`` carry after W steps.
    """
    import jax.numpy as jnp

    from sampling_gpmpc_tpu.dempc import shift_solution

    n_dev = mesh.shape[axis]
    assert spec.ns % n_dev == 0
    local_spec = dataclasses.replace(spec, ns=spec.ns // n_dev)

    gp_spec = GPState(real_Z=P(), real_Y=P(),
                      real_fact={"L": P(), "w": P(), "mask": P(),
                                 "Linv": P(), "alpha": P()},
                      hall_Z=P(axis), hall_Y=P(axis), hall_n=P())
    ocp_specs = type(ocp)(*([P()] * len(ocp)))._replace(w_cost=P(axis))

    def body(x0, X0, U0, gp0, eps_all, ocp_l):
        W = eps_all.shape[0]

        def step(k, c):
            x, X, U, gp, ws, wv = c
            eps_m = jax.lax.dynamic_index_in_dim(eps_all, k, keepdims=False)
            st = sqp.solve(local_spec, env, hyp, ocp_l, x, X, U, gp, eps_m,
                           axis_name=axis, qp_ws=ws, qp_valid=wv,
                           ordered=ordered)
            X, U = st.X, st.U
            u0 = U[0]
            if local_spec.use_feedback:
                u0 = u0 - (ocp_l.x_eq - X[0, 0]) @ ocp_l.K_fb.T
            x_next = env.discrete_dyn(X[0, 0], u0).reshape(-1)
            if local_spec.shift_soln:
                X, U = shift_solution(local_spec, X, U)
            return x_next, X, U, st.gp, st.qp_ws, st.qp_valid

        ws0 = sqp.init_qp_ws(local_spec, X0.dtype)
        c = jax.lax.fori_loop(
            0, W, step, (x0, X0, U0, gp0, ws0, jnp.asarray(False)))
        return c[0], c[1], c[2], c[3]

    kwargs = dict(
        mesh=mesh,
        in_specs=(P(), P(None, axis), P(), gp_spec,
                  P(None, None, axis), ocp_specs),
        out_specs=(P(), P(None, axis), P(), gp_spec),
    )
    try:
        mapped = shard_map(body, check_vma=False, **kwargs)
    except TypeError:
        mapped = shard_map(body, check_rep=False, **kwargs)
    jitted = jax.jit(mapped)
    return lambda x0, X0, U0, gp0, eps_all: jitted(
        x0, X0, U0, gp0, eps_all, ocp)


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
                      real_fact={"L": P(), "w": P(), "mask": P(),
                                 "Linv": P(), "alpha": P()},
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
