"""Order-defined cross-shard collectives (determinism mode).

``jax.lax.psum``'s reduction order across devices is an implementation
detail of the XLA collective (ring vs tree, backend- and
topology-dependent): the sharded program and its single-device equivalent
— or the same program on two different meshes — can differ in the last
ulp, and the sampled-GP + QP chain amplifies ulp-level seeds through
discrete branches (jitter-escalation retries, PDIP step acceptance,
warm-start gates) into O(1) trajectory divergence, which is why a
multi-iteration sharded-vs-single-device comparison cannot carry a
meaningful tolerance under plain psum.

``ordered=True`` replaces every cross-shard SUM with all_gather + a
sequential shard-ordered reduction: the result is one well-defined
floating-point sum, bit-reproducible across collective implementations
and exactly reproducible by a single-device program that computes the
same per-block partials (``jax.vmap`` over the block axis with the same
``axis_name`` — see parallel/sharded.py::make_blocked_solve).  min/max
reductions are order-independent, so pmin/pmax stay native.

Cost: an n-shard all_gather moves ~(n-1)x the payload of psum's
reduce-scatter lower bound and the sequential reduction adds n-1
dependent adds; negligible for this solver's collectives (nothing larger
than the (nU, nU) condensed Hessian) but measurable at scale — hence a
mode, defaulting to the fast native psum.
"""

from __future__ import annotations

import jax


def ordered_psum(x, axis_name):
    """all_gather + sequential shard-ordered sum (see module docstring).

    Accepts pytrees (tuples of arrays) like ``jax.lax.psum``: callers fuse
    independent reductions into ONE tuple-psum per round trip
    (ocp/qp.py's per-PDIP-iteration collectives); each leaf is reduced in
    shard order independently, so the per-leaf arithmetic is identical to
    a per-leaf call.
    """
    tm = jax.tree_util.tree_map
    g = jax.lax.all_gather(x, axis_name)   # (n_shards, ...) in axis order
    n = jax.tree_util.tree_leaves(g)[0].shape[0]
    return jax.lax.fori_loop(
        1, n, lambda i, acc: tm(lambda a, gg: a + gg[i], acc, g),
        tm(lambda gg: gg[0], g))


def make_reducers(axis_name, ordered: bool = False):
    """(psum, pmin, pmax) closures for a maybe-sharded computation.

    ``axis_name=None`` (single device): identities.  Otherwise native
    collectives, with the sum replaced by :func:`ordered_psum` when
    ``ordered`` is set.
    """
    if axis_name is None:
        ident = lambda x: x
        return ident, ident, ident
    if ordered:
        psum = lambda x: ordered_psum(x, axis_name)
    else:
        psum = lambda x: jax.lax.psum(x, axis_name)
    return (psum,
            lambda x: jax.lax.pmin(x, axis_name),
            lambda x: jax.lax.pmax(x, axis_name))
