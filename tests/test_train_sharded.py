"""Train-axis-sharded GP posterior (E8) vs the dense Cholesky oracle.

The sharded path (row-sharded kernel matvecs + distributed CG,
gp/train_sharded.py) must reproduce the exact posterior computed densely
on one device, for both plain and derivative-observation kernels, and
must be partition-count invariant (2 vs 8 shards)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sampling_gpmpc_tpu.gp.kernel import kernel_matrix
from sampling_gpmpc_tpu.gp.train_sharded import sharded_posterior_fn
from sampling_gpmpc_tpu.parallel.mesh import sample_mesh


def dense_posterior(Z, y, noise_rows, X, ls, os_, with_grad):
    K = kernel_matrix(Z, Z, ls, os_, with_grad)
    A = K + jnp.diag(noise_rows)
    L = jnp.linalg.cholesky(A)
    Kxz = kernel_matrix(X, Z, ls, os_, with_grad)
    mean = Kxz @ jax.scipy.linalg.cho_solve((L, True), y)
    S = jax.scipy.linalg.cho_solve((L, True), Kxz.T)
    cov = kernel_matrix(X, X, ls, os_, with_grad) - Kxz @ S
    return mean, 0.5 * (cov + cov.T)


def _problem(with_grad, n_pts=32, m=5, d=2, seed=0):
    rng = np.random.default_rng(seed)
    Z = jnp.asarray(rng.uniform(-2, 2, size=(n_pts, d)))
    X = jnp.asarray(rng.uniform(-2, 2, size=(m, d)))
    rows = n_pts * (1 + d) if with_grad else n_pts
    y = jnp.asarray(rng.normal(size=(rows,)))
    noise = jnp.asarray(rng.uniform(1e-3, 1e-2, size=(rows,)))
    ls = np.array([0.9] * d)
    os_ = 0.7
    return Z, y, noise, X, ls, os_


@pytest.mark.parametrize("with_grad", [False, True])
def test_sharded_matches_dense(with_grad):
    Z, y, noise, X, ls, os_ = _problem(with_grad)
    mesh = sample_mesh(8, axis="train")
    f = sharded_posterior_fn(mesh, "train", ls, os_, with_grad)
    mean_s, cov_s = jax.jit(f)(Z, y, noise, X)
    mean_d, cov_d = dense_posterior(Z, y, noise, X, ls, os_, with_grad)
    np.testing.assert_allclose(np.asarray(mean_s), np.asarray(mean_d),
                               atol=1e-8, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(cov_s), np.asarray(cov_d),
                               atol=1e-8)


def test_partition_count_invariance():
    Z, y, noise, X, ls, os_ = _problem(with_grad=False, n_pts=40)
    out = {}
    for p in (2, 8):
        mesh = sample_mesh(p, axis="train")
        f = sharded_posterior_fn(mesh, "train", ls, os_, False)
        out[p] = jax.jit(f)(Z, y, noise, X)
    np.testing.assert_allclose(np.asarray(out[2][0]), np.asarray(out[8][0]),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(out[2][1]), np.asarray(out[8][1]),
                               atol=1e-9)


def test_conditioning_set_bound_for_shipped_configs():
    """Measured conditioning-set sizes across every shipped config: the
    closed-loop workloads stay small enough for the dense per-chip path
    (< 4096 rows per (sample, output)), while the 150-SQP-iteration
    car-residual debug config reaches ~22k rows at full static capacity
    (a ~4 GB dense kernel) — the workload the train-axis-sharded path
    exists for.  This is the quantitative version of the round-1
    'subsumed by batching' claim."""
    import glob
    import os

    from sampling_gpmpc_tpu.config import load_problem

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sizes = {}
    for path in glob.glob(os.path.join(here, "params", "params_*.yaml")):
        try:
            params, spec, _ = load_problem(path)
        except KeyError:
            continue    # approx-scheme envs (drone) live outside the registry
        n_real = (params["env"]["n_data_x"]
                  * params["env"].get("n_data_u", 1))
        rows = (n_real + spec.H * spec.max_sqp_iter) * spec.Ty
        sizes[os.path.basename(path)] = rows
    small = {k: v for k, v in sizes.items() if "car_residual" not in k}
    assert small and max(small.values()) <= 4096, small
    assert max(sizes.values()) > 16000, sizes   # the escape-hatch motivator
