"""LavaGap (reference /root/reference/minigrid/envs/lavagap.py).

One vertical obstacle wall (lava or wall) spanning rows 1..height-2 with a
single random gap; agent starts at (1, 1) facing right, goal bottom-right.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_dynamicprogramming_tpu.core.constants import (
    COLOR_GREEN,
    COLOR_GREY,
    COLOR_RED,
    OBJ_GOAL,
    OBJ_LAVA,
    OBJ_WALL,
)
from minigrid_dynamicprogramming_tpu.core.env import Environment
from minigrid_dynamicprogramming_tpu.core.state import EnvParams, new_state
from minigrid_dynamicprogramming_tpu.ops import grid as G

MISSION_LAVA = "avoid the lava and get to the green goal square"
MISSION_WALL = "find the opening and get to the green goal square"


def make_lavagap(
    env_id: str, size: int, obstacle: str = "lava"
) -> Environment:
    params = EnvParams(
        width=size,
        height=size,
        max_steps=4 * size * size,
        see_through_walls=False,
    )
    obj, col = (
        (OBJ_LAVA, COLOR_RED) if obstacle == "lava" else (OBJ_WALL, COLOR_GREY)
    )
    mission = MISSION_LAVA if obstacle == "lava" else MISSION_WALL

    def generate(key: jax.Array, p: EnvParams):
        k_gx, k_gy, k_state = jax.random.split(key, 3)
        state = new_state(p.height, p.width, rng=k_state)
        state = G.wall_rect(state, 0, 0, p.width, p.height)
        state = state.replace(
            agent_pos=jnp.asarray((1, 1), dtype=jnp.int32),
            agent_dir=jnp.asarray(0, dtype=jnp.int32),
        )
        state = G.put_obj(state, p.width - 2, p.height - 2, OBJ_GOAL, COLOR_GREEN)
        # Gap position: x in [2, width-2), y in [1, height-1) (lavagap.py).
        gap_x = jax.random.randint(k_gx, (), 2, p.width - 2)
        gap_y = jax.random.randint(k_gy, (), 1, p.height - 1)
        state = G.paint(
            state,
            G.vert_wall_mask(p.height, p.width, gap_x, 1, p.height - 2),
            obj,
            col,
        )
        state = G.clear_cell(state, gap_x, gap_y)
        return state

    return Environment(env_id, params, generate, mission_text=lambda c: mission)
