"""Dynamic programming — the fork's namesake capability (SURVEY.md §0, §2.6).

Batched exact value iteration over the tabular (door-config, carrying, dir,
y, x) state space of generated layouts: an XLA structured-sweep path
(:mod:`.tabular`) plus a VMEM-resident Pallas TPU kernel (:mod:`.pallas_vi`).
"""

from minigrid_dynamicprogramming_tpu.dp.tabular import (
    TabularLayout,
    env_return,
    extract_layout,
    greedy_action,
    solve,
    state_value,
    steps_to_go,
    value_iteration,
)
from minigrid_dynamicprogramming_tpu.dp.pallas_vi import pallas_value_iteration

__all__ = [
    "TabularLayout",
    "extract_layout",
    "value_iteration",
    "pallas_value_iteration",
    "solve",
    "greedy_action",
    "state_value",
    "steps_to_go",
    "env_return",
]
