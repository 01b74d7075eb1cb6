"""Playground (reference /root/reference/minigrid/envs/playground.py).

19x19, 3x3 rooms connected by random-colored doors, 12 random objects,
no goal or reward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_dynamicprogramming_tpu.core.constants import (
    OBJ_BALL,
    OBJ_BOX,
    OBJ_DOOR,
    OBJ_KEY,
    STATE_CLOSED,
)
from minigrid_dynamicprogramming_tpu.core.env import Environment
from minigrid_dynamicprogramming_tpu.core.state import EnvParams, new_state
from minigrid_dynamicprogramming_tpu.ops import grid as G

TYPES = jnp.asarray([OBJ_KEY, OBJ_BALL, OBJ_BOX], dtype=jnp.int32)


def make_playground(env_id: str, max_steps: int = 100) -> Environment:
    size = 19
    params = EnvParams(
        width=size, height=size, max_steps=max_steps, see_through_walls=False
    )
    room_w = size // 3
    room_h = size // 3

    def generate(key: jax.Array, p: EnvParams):
        keys = jax.random.split(key, 64)
        kidx = 0
        state = new_state(p.height, p.width, rng=keys[-1])
        state = G.wall_rect(state, 0, 0, size, size)

        for j in range(3):
            for i in range(3):
                x_l, y_t = i * room_w, j * room_h
                x_r, y_b = x_l + room_w, y_t + room_h
                if i + 1 < 3:
                    state = G.vert_wall(state, x_r, y_t, room_h)
                    dy = jax.random.randint(keys[kidx], (), y_t + 1, y_b - 1)
                    dc = jax.random.randint(keys[kidx + 1], (), 0, 6)
                    kidx += 2
                    state = G.put_obj(state, x_r, dy, OBJ_DOOR, dc, STATE_CLOSED)
                if j + 1 < 3:
                    state = G.horz_wall(state, x_l, y_b, room_w)
                    dx = jax.random.randint(keys[kidx], (), x_l + 1, x_r - 1)
                    dc = jax.random.randint(keys[kidx + 1], (), 0, 6)
                    kidx += 2
                    state = G.put_obj(state, dx, y_b, OBJ_DOOR, dc, STATE_CLOSED)

        state, _ = G.place_agent(keys[kidx], state)
        kidx += 1
        for _ in range(12):
            t = TYPES[jax.random.randint(keys[kidx], (), 0, 3)]
            c = jax.random.randint(keys[kidx + 1], (), 0, 6)
            state, _, _ = G.place_obj(keys[kidx + 2], state, t, c)
            kidx += 3
        return state

    return Environment(env_id, params, generate, mission_text=lambda c: "")
