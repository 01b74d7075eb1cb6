"""DistShift (reference /root/reference/minigrid/envs/distshift.py).

Fixed 9x7 room with two lava strips; variant 2 moves the second strip from
row 2 to row 5.  Fully deterministic layout.
"""

from __future__ import annotations

import jax

from minigrid_dynamicprogramming_tpu.core.constants import (
    COLOR_GREEN,
    COLOR_RED,
    OBJ_GOAL,
    OBJ_LAVA,
)
from minigrid_dynamicprogramming_tpu.core.env import Environment
from minigrid_dynamicprogramming_tpu.core.state import EnvParams, new_state
from minigrid_dynamicprogramming_tpu.ops import grid as G

MISSION = "get to the green goal square"


def make_distshift(
    env_id: str,
    width: int = 9,
    height: int = 7,
    strip2_row: int = 2,
    agent_start_pos=(1, 1),
    agent_start_dir: int = 0,
) -> Environment:
    params = EnvParams(
        width=width,
        height=height,
        max_steps=4 * width * height,
        see_through_walls=True,
    )

    def generate(key: jax.Array, p: EnvParams):
        state = new_state(p.height, p.width, rng=key)
        state = G.wall_rect(state, 0, 0, p.width, p.height)
        state = G.put_obj(state, p.width - 2, 1, OBJ_GOAL, COLOR_GREEN)
        # Two lava strips of length width-6 starting at x=3 (distshift.py
        # _gen_grid): rows 1 and strip2_row.
        for row in (1, strip2_row):
            state = G.paint(
                state,
                G.horz_wall_mask(p.height, p.width, 3, row, p.width - 6),
                OBJ_LAVA,
                COLOR_RED,
            )
        import jax.numpy as jnp

        state = state.replace(
            agent_pos=jnp.asarray(agent_start_pos, dtype=jnp.int32),
            agent_dir=jnp.asarray(agent_start_dir, dtype=jnp.int32),
        )
        return state

    return Environment(env_id, params, generate, mission_text=lambda c: MISSION)
