"""Environment registry (ref: main.py:73 `globals()[dynamics]`)."""

from sampling_gpmpc_tpu.config import ProblemSpec
from sampling_gpmpc_tpu.envs import car, car_residual, pendulum, pendulum1d
from sampling_gpmpc_tpu.envs.base import Env

_REGISTRY = {
    "pendulum": pendulum,
    "Pendulum1D": pendulum1d,
    "bicycle": car,
    "bicycle_Bdx": car_residual,
}


def make_env(spec: ProblemSpec, params: dict) -> Env:
    return _REGISTRY[spec.env_name].make(spec, params)


def env_meta(name: str) -> dict:
    """Per-env GP index metadata, declared by each env module (the reference
    keeps g_idx_inputs/pad_g on the env class, e.g. pendulum1D.py:15-16)."""
    mod = _REGISTRY[name]
    return {"g_idx": tuple(mod.G_IDX_INPUTS), "pad_g": tuple(mod.PAD_G)}
