"""Cross-framework GP oracle: raw-torch posterior vs the JAX exact GP.

The torch forward-sampling baseline (benchmarking/torch_fs_baseline.py)
re-implements the reference's value-only GP pipeline in a different
framework with independently written kernel/solve code; in f64 both must
produce the same posterior to near machine precision.  This is the same
cross-implementation check role the native C++ QP twin plays for the
solver.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from sampling_gpmpc_tpu.gp import exact  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarking"))

import torch_fs_baseline as tb  # noqa: E402


def test_torch_posterior_matches_jax_exact_gp():
    rng = np.random.default_rng(0)
    N, D = 17, 2
    Z = rng.uniform(-1, 1, size=(N, D))
    y = np.sin(Z[:, 0]) * np.cos(2 * Z[:, 1])
    x = rng.uniform(-1, 1, size=(5, D))
    ls = np.asarray([0.7, 1.3])
    os_ = 0.9
    noise = 1e-5

    # torch side (batched API: batch of 5 single-point queries sharing Z)
    Zt = torch.as_tensor(Z).expand(5, N, D)
    yt = torch.as_tensor(y).expand(5, N)
    xt = torch.as_tensor(x).unsqueeze(1)
    m_t, v_t = tb.gp_posterior(
        Zt, yt, xt, torch.as_tensor(ls).expand(5, D),
        torch.full((5,), os_, dtype=torch.float64),
        torch.full((5,), noise, dtype=torch.float64))

    # JAX side (value-only: Ty=1, with_grad=False)
    fact = exact.condition(jnp.asarray(Z), jnp.asarray(y)[:, None],
                           jnp.asarray(ls), jnp.asarray(os_),
                           jnp.asarray([noise]), 0.0, False)
    mean_j, cov_j = exact.predict(jnp.asarray(x), jnp.asarray(Z), fact,
                                  jnp.asarray(ls), jnp.asarray(os_),
                                  0.0, False)
    np.testing.assert_allclose(np.asarray(m_t), np.asarray(mean_j).ravel(),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(v_t),
                               np.diag(np.asarray(cov_j)), atol=1e-9)


def test_torch_rollout_runs_and_matches_envelope():
    """Tiny fs rollout: finite, bounded, and the sampled tube contains the
    noise-free mean rollout (beta-clipping invariant)."""
    import yaml
    from sampling_gpmpc_tpu.config import load_problem
    import dataclasses

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    params, spec, data = load_problem(
        os.path.join(here, "params", "params_car_residual_fs.yaml"))
    ns, steps = 16, 8
    spec = dataclasses.replace(spec, ns=ns)
    U = np.zeros((steps, spec.nu))
    out = tb.run(params, spec, data, ns, steps, U, seed=1)
    X = out["X_traj"]
    assert X.shape == (steps + 1, ns, spec.nx)
    assert out["nan_frac"] == 0.0
    assert np.all(np.isfinite(X))
    # realizations diverge (epistemic spread) but stay bounded
    assert np.ptp(X[-1], axis=0).max() > 1e-6
    assert np.abs(X).max() < 1e3
