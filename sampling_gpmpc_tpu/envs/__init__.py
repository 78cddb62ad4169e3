"""Environment registry (ref: main.py:73 `globals()[dynamics]`)."""

from sampling_gpmpc_tpu.config import ProblemSpec
from sampling_gpmpc_tpu.envs import car, car_residual, pendulum, pendulum1d
from sampling_gpmpc_tpu.envs.base import Env

_REGISTRY = {
    "pendulum": pendulum.make,
    "Pendulum1D": pendulum1d.make,
    "bicycle": car.make,
    "bicycle_Bdx": car_residual.make,
}


def make_env(spec: ProblemSpec, params: dict) -> Env:
    return _REGISTRY[spec.env_name](spec, params)
