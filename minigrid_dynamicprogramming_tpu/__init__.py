"""TPU-native Minigrid framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
cytab/Minigrid_DynamicProgramming (a fork of Farama Minigrid v2.3.1):
struct-of-arrays world state, branchless batched transition and observation
kernels, on-device procedural generation, device-side observation wrappers, a
batched tabular value-iteration (dynamic-programming) solver, and multi-host
sharding of environment batches over TPU meshes.
"""

__version__ = "0.1.0"

from minigrid_dynamicprogramming_tpu.core.env import Environment
from minigrid_dynamicprogramming_tpu.core.state import EnvParams, EnvState
from minigrid_dynamicprogramming_tpu.registry import (
    make,
    register,
    registered_ids,
)

__all__ = [
    "Environment",
    "EnvParams",
    "EnvState",
    "make",
    "register",
    "registered_ids",
    "__version__",
]
