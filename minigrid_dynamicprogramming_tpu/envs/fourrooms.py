"""FourRooms (reference /root/reference/minigrid/envs/fourrooms.py:9-128).

19x19 grid split into a 2x2 matrix of rooms with one random gap per internal
wall; agent and goal are placed uniformly at random (or at fixed positions).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from minigrid_dynamicprogramming_tpu.core.constants import COLOR_GREEN, OBJ_GOAL
from minigrid_dynamicprogramming_tpu.core.env import Environment
from minigrid_dynamicprogramming_tpu.core.state import EnvParams, new_state
from minigrid_dynamicprogramming_tpu.ops import grid as G

MISSION = "reach the goal"


def make_fourrooms(
    env_id: str,
    agent_pos: Optional[Tuple[int, int]] = None,
    goal_pos: Optional[Tuple[int, int]] = None,
    max_steps: int = 100,
) -> Environment:
    size = 19
    params = EnvParams(
        width=size, height=size, max_steps=max_steps, see_through_walls=False
    )

    def generate(key: jax.Array, p: EnvParams):
        keys = jax.random.split(key, 8)
        state = new_state(p.height, p.width, rng=keys[7])
        state = G.wall_rect(state, 0, 0, p.width, p.height)

        room_w = p.width // 2
        room_h = p.height // 2

        # Internal walls with one random gap each (fourrooms.py:93-112).
        # j = room row, i = room column; same loop structure, masked paints.
        kidx = 0
        for j in range(2):
            for i in range(2):
                x_l, y_t = i * room_w, j * room_h
                x_r, y_b = x_l + room_w, y_t + room_h
                if i + 1 < 2:
                    state = G.paint(
                        state,
                        G.vert_wall_mask(p.height, p.width, x_r, y_t, room_h),
                        2,
                        5,
                    )
                    gap_y = jax.random.randint(keys[kidx], (), y_t + 1, y_b)
                    kidx += 1
                    state = G.clear_cell(state, x_r, gap_y)
                if j + 1 < 2:
                    state = G.paint(
                        state,
                        G.horz_wall_mask(p.height, p.width, x_l, y_b, room_w),
                        2,
                        5,
                    )
                    gap_x = jax.random.randint(keys[kidx], (), x_l + 1, x_r)
                    kidx += 1
                    state = G.clear_cell(state, gap_x, y_b)

        if agent_pos is not None:
            state = G.clear_cell(state, agent_pos[0], agent_pos[1])
            state = state.replace(
                agent_pos=jnp.asarray(agent_pos, dtype=jnp.int32),
                agent_dir=jax.random.randint(keys[kidx], (), 0, 4),
            )
            kidx += 1
        else:
            state, _ = G.place_agent(keys[kidx], state)
            kidx += 1

        if goal_pos is not None:
            state = G.put_obj(state, goal_pos[0], goal_pos[1], OBJ_GOAL, COLOR_GREEN)
        else:
            state, _, _ = G.place_obj(keys[kidx], state, OBJ_GOAL, COLOR_GREEN)
        return state

    return Environment(
        env_id, params, generate, mission_text=lambda codes: MISSION
    )
