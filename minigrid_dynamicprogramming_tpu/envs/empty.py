"""Empty room (reference /root/reference/minigrid/envs/empty.py:9-114).

Walled box with a goal in the bottom-right corner; agent starts either at a
fixed pose (``(1, 1)`` facing right) or at a random free cell.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from minigrid_dynamicprogramming_tpu.core.constants import COLOR_GREEN, OBJ_GOAL
from minigrid_dynamicprogramming_tpu.core.env import Environment
from minigrid_dynamicprogramming_tpu.core.state import EnvParams, new_state
from minigrid_dynamicprogramming_tpu.ops import grid as G

MISSION = "get to the green goal square"


def make_empty(
    env_id: str,
    size: int = 8,
    agent_start_pos: Optional[Tuple[int, int]] = (1, 1),
    agent_start_dir: int = 0,
    max_steps: Optional[int] = None,
) -> Environment:
    params = EnvParams(
        width=size,
        height=size,
        max_steps=4 * size * size if max_steps is None else max_steps,
        see_through_walls=True,  # empty.py:85
    )

    def generate(key: jax.Array, p: EnvParams):
        k_agent, k_state = jax.random.split(key)
        state = new_state(p.height, p.width, rng=k_state)
        state = G.wall_rect(state, 0, 0, p.width, p.height)
        state = G.put_obj(state, p.width - 2, p.height - 2, OBJ_GOAL, COLOR_GREEN)
        if agent_start_pos is not None:
            state = state.replace(
                agent_pos=state.agent_pos.at[0]
                .set(agent_start_pos[0])
                .at[1]
                .set(agent_start_pos[1]),
                agent_dir=state.agent_dir * 0 + agent_start_dir,
            )
        else:
            state, _ = G.place_agent(k_agent, state)
        return state

    return Environment(
        env_id, params, generate, mission_text=lambda codes: MISSION
    )
