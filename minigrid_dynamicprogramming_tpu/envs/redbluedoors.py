"""RedBlueDoors (reference /root/reference/minigrid/envs/redbluedoors.py).

A size x size inner room inside a 2*size x size grid; red door on the left
inner wall, blue door on the right.  The agent must open the red door first,
then the blue door.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_dynamicprogramming_tpu.core.constants import (
    COLOR_BLUE,
    COLOR_RED,
    OBJ_DOOR,
    STATE_CLOSED,
    STATE_OPEN,
)
from minigrid_dynamicprogramming_tpu.core.env import Environment
from minigrid_dynamicprogramming_tpu.core.state import EnvParams, new_state
from minigrid_dynamicprogramming_tpu.ops import agnostic as AG
from minigrid_dynamicprogramming_tpu.ops import grid as G
from minigrid_dynamicprogramming_tpu.ops.step import success_reward

MISSION = "open the red door then the blue door"


def make_redbluedoors(env_id: str, size: int = 8) -> Environment:
    params = EnvParams(
        width=2 * size,
        height=size,
        max_steps=20 * size * size,
        see_through_walls=False,
    )

    def generate(key: jax.Array, p: EnvParams):
        keys = jax.random.split(key, 4)
        state = new_state(p.height, p.width, rng=keys[-1])
        state = G.wall_rect(state, 0, 0, 2 * size, size)
        state = G.wall_rect(state, size // 2, 0, size, size)
        inside = G.rect_mask(p.height, p.width, (size // 2, 0), (size, size))
        state, _ = G.place_agent(keys[0], state, reject_mask=~inside)
        red_y = jax.random.randint(keys[1], (), 1, size - 1)
        blue_y = jax.random.randint(keys[2], (), 1, size - 1)
        red_x = size // 2
        blue_x = size // 2 + size - 1
        state = G.put_obj(state, red_x, red_y, OBJ_DOOR, COLOR_RED, STATE_CLOSED)
        state = G.put_obj(state, blue_x, blue_y, OBJ_DOOR, COLOR_BLUE, STATE_CLOSED)
        aux = (
            state.aux.at[0].set(red_x).at[1].set(red_y)
            .at[2].set(blue_x).at[3].set(blue_y)
        )
        return state.replace(aux=aux)

    def post_step(p, key, prev, state, action, reward, terminated):
        def door_open(s, i):
            return (
                AG.read_cell(p, s, "grid_state", s.aux[2 * i], s.aux[2 * i + 1])
                == STATE_OPEN
            )

        red_before = door_open(prev, 0)
        blue_before = door_open(prev, 1)
        red_after = door_open(state, 0)
        blue_after = door_open(state, 1)
        # Ordering logic (redbluedoors.py:step).
        win = blue_after & red_before
        lose = (blue_after & ~red_before) | (red_after & ~blue_after & blue_before)
        reward = jnp.where(
            win, success_reward(state.step_count, p.max_steps), reward
        )
        reward = jnp.where(lose, 0.0, reward)
        terminated = terminated | win | lose
        return state, reward, terminated

    return Environment(
        env_id,
        params,
        generate,
        post_step=post_step,
        hook_rng=False,  # reward/termination override only — no randomness
        post_step_lanes=post_step,  # layout-polymorphic via AG.read_cell
        mission_text=lambda c: MISSION,
    )
