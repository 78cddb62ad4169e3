"""Test configuration: run everything on a virtual 8-device CPU mesh in f64.

The axon sitecustomize registers a TPU platform at interpreter start; we
switch to CPU before any backend initializes (backend init is lazy).
"""

import os
import sys

os.environ.setdefault("SGPMPC_DTYPE", "float64")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sampling_gpmpc_tpu.setup import enable_x64, force_cpu_mesh  # noqa: E402

force_cpu_mesh(8)
enable_x64()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def repo_root():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def params_dir(repo_root):
    return os.path.join(repo_root, "params")
