"""Full-length closed-loop golden regression tests (VERDICT #1 / Weak #1).

Every flagship config runs its FULL reference length in deterministic f64
on the host-CPU platform and must reproduce the committed golden
trajectory to ~1e-8 — a numerical regression after ANY MPC step fails the
suite.  Goldens: tests/goldens/*.npz, regenerated with
``python -m sampling_gpmpc_tpu.tools.goldens``.

These are the longest tests in the suite (the car config alone is
~2.5 min of 130 full SQP solves); that is the point — truncated runs
pinned nothing past step 15 (ref lengths: src/DEMPC.py:39-80 +
params/*.yaml MPC-iteration counts).
"""

import numpy as np
import pytest

from sampling_gpmpc_tpu.tools.goldens import (GOLDEN_ATOL, GOLDEN_CONFIGS,
                                              load_golden, run_closed_loop)


@pytest.mark.slow
@pytest.mark.parametrize("config", GOLDEN_CONFIGS)
def test_golden_closed_loop(config):
    golden = load_golden(config)
    got = run_closed_loop(config)
    assert set(got) == set(golden)
    for key in sorted(golden):
        np.testing.assert_allclose(
            got[key], golden[key], atol=GOLDEN_ATOL, rtol=0.0,
            err_msg=f"{config}: '{key}' drifted from the committed golden")
