"""DoorKey (reference /root/reference/minigrid/envs/doorkey.py:9-100).

Random vertical splitting wall with a locked yellow door; yellow key and the
agent start on the left side, the goal sits bottom-right.
"""

from __future__ import annotations

from typing import Optional

import jax

from minigrid_dynamicprogramming_tpu.core.constants import (
    COLOR_GREEN,
    COLOR_YELLOW,
    OBJ_DOOR,
    OBJ_GOAL,
    OBJ_KEY,
    STATE_LOCKED,
)
from minigrid_dynamicprogramming_tpu.core.env import Environment
from minigrid_dynamicprogramming_tpu.core.state import EnvParams, new_state
from minigrid_dynamicprogramming_tpu.ops import grid as G

MISSION = "use the key to open the door and then get to the goal"


def make_doorkey(
    env_id: str, size: int = 8, max_steps: Optional[int] = None
) -> Environment:
    params = EnvParams(
        width=size,
        height=size,
        max_steps=10 * size * size if max_steps is None else max_steps,
        see_through_walls=False,
    )

    def generate(key: jax.Array, p: EnvParams):
        k_split, k_agent, k_door, k_key, k_state = jax.random.split(key, 5)
        state = new_state(p.height, p.width, rng=k_state)
        state = G.wall_rect(state, 0, 0, p.width, p.height)
        state = G.put_obj(state, p.width - 2, p.height - 2, OBJ_GOAL, COLOR_GREEN)

        # Vertical splitting wall at splitIdx in [2, width-2) (doorkey.py:86-87)
        split_idx = jax.random.randint(k_split, (), 2, p.width - 2)
        state = G.paint(
            state,
            G.vert_wall_mask(p.height, p.width, split_idx, 0, p.height),
            2,  # OBJ_WALL
            5,  # grey
        )

        # Agent on the left side (doorkey.py:91): rect (0,0)..(splitIdx, height).
        ys, xs = G.coord_grids(p.height, p.width)
        left_of_wall = xs < split_idx
        state, _ = G.place_agent(k_agent, state, reject_mask=~left_of_wall)

        # Locked yellow door at (splitIdx, doorIdx), doorIdx in [1, width-2)
        # (doorkey.py:93-95 — the reference draws the row bound from *width*).
        door_idx = jax.random.randint(k_door, (), 1, p.width - 2)
        state = G.put_obj(
            state, split_idx, door_idx, OBJ_DOOR, COLOR_YELLOW, STATE_LOCKED
        )

        # Yellow key on the left side (doorkey.py:98).
        state, _, _ = G.place_obj(
            k_key, state, OBJ_KEY, COLOR_YELLOW, reject_mask=~left_of_wall
        )
        return state

    return Environment(
        env_id, params, generate, mission_text=lambda codes: MISSION
    )
