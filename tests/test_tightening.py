"""Tightening math vs the reference implementation (pure-numpy oracle,
imported read-only from /root/reference — not shipped)."""

import os
import sys

import numpy as np
import pytest

from sampling_gpmpc_tpu.config import load_params
from sampling_gpmpc_tpu.tightening import reachable_set_ball

REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_matches_reference_oracle(params_dir, capsys):
    sys.path.insert(0, REF)
    from src.utils.reachable_set import get_reachable_set_ball  # noqa

    params = load_params(os.path.join(params_dir, "params_pendulum1D_samples.yaml"))
    H = params["optimizer"]["H"]
    for V in [np.ones(H + 1), np.linspace(14.0, 9.0, H + 1)]:
        ours, ours_ci = reachable_set_ball(params, V)
        ref, ref_ci = get_reachable_set_ball(params, V)
        np.testing.assert_allclose(ours, np.stack(ref), rtol=1e-12)
        np.testing.assert_allclose(ours_ci, np.asarray(ref_ci), rtol=1e-12)
