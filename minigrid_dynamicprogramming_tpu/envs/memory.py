"""Memory (reference /root/reference/minigrid/envs/memory.py:12-165).

A small start room shows a green key or ball; at the end of a hallway the
agent must step next to the matching object.  ``pickup`` is aliased to
``toggle`` (memory.py:153-155).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_dynamicprogramming_tpu.core.constants import (
    COLOR_GREEN,
    COLOR_GREY,
    OBJ_BALL,
    OBJ_KEY,
    OBJ_WALL,
)
from minigrid_dynamicprogramming_tpu.core.env import Environment
from minigrid_dynamicprogramming_tpu.core.state import EnvParams, EnvState, new_state
from minigrid_dynamicprogramming_tpu.ops import grid as G
from minigrid_dynamicprogramming_tpu.ops.step import success_reward

MISSION = "go to the matching object at the end of the hallway"


def make_memory(
    env_id: str, size: int = 8, random_length: bool = False
) -> Environment:
    assert size % 2 == 1
    params = EnvParams(
        width=size,
        height=size,
        max_steps=5 * size * size,
        see_through_walls=False,
    )

    def generate(key: jax.Array, p: EnvParams):
        keys = jax.random.split(key, 6)
        h, w = p.height, p.width
        state = new_state(h, w, rng=keys[-1])
        state = G.wall_rect(state, 0, 0, w, h)
        upper = h // 2 - 2
        lower = h // 2 + 2
        hallway_end = (
            jax.random.randint(keys[0], (), 4, w - 2)
            if random_length
            else jnp.asarray(w - 3, jnp.int32)
        )
        ys, xs = G.coord_grids(h, w)
        m = jnp.zeros((h, w), dtype=bool)
        # Start-room walls (memory.py:100-105).
        m |= (ys == upper) & (xs >= 1) & (xs <= 4)
        m |= (ys == lower) & (xs >= 1) & (xs <= 4)
        m |= (xs == 4) & (ys == upper + 1)
        m |= (xs == 4) & (ys == lower - 1)
        # Hallway walls from x=5 to hallway_end-1 (memory.py:106-108).
        m |= (ys == upper + 1) & (xs >= 5) & (xs < hallway_end)
        m |= (ys == lower - 1) & (xs >= 5) & (xs < hallway_end)
        # End walls (memory.py:110-113).
        m |= (xs == hallway_end) & (ys != h // 2)
        m |= (xs == hallway_end + 2)
        state = G.paint(state, m, OBJ_WALL, COLOR_GREY)

        state = state.replace(
            agent_pos=jnp.stack(
                [
                    jax.random.randint(keys[1], (), 1, hallway_end + 1),
                    jnp.asarray(h // 2, jnp.int32),
                ]
            ),
            agent_dir=jnp.asarray(0, jnp.int32),
        )

        # Start-room object and the two candidates (memory.py:119-131).
        start_is_key = jax.random.randint(keys[2], (), 0, 2) == 0
        start_obj = jnp.where(start_is_key, OBJ_KEY, OBJ_BALL).astype(jnp.uint8)
        state = G.put_obj(state, 1, h // 2 - 1, start_obj, COLOR_GREEN)
        first_is_ball = jax.random.randint(keys[3], (), 0, 2) == 0
        obj0 = jnp.where(first_is_ball, OBJ_BALL, OBJ_KEY).astype(jnp.uint8)
        obj1 = jnp.where(first_is_ball, OBJ_KEY, OBJ_BALL).astype(jnp.uint8)
        p0 = (hallway_end + 1, h // 2 - 2)
        p1 = (hallway_end + 1, h // 2 + 2)
        state = G.put_obj(state, p0[0], p0[1], obj0, COLOR_GREEN)
        state = G.put_obj(state, p1[0], p1[1], obj1, COLOR_GREEN)

        # Success/failure squares (memory.py:134-149).
        match0 = start_obj == obj0
        sx = p0[0]
        sy = jnp.where(match0, p0[1] + 1, p1[1] - 1)
        fy = jnp.where(match0, p1[1] - 1, p0[1] + 1)
        aux = (
            state.aux.at[0].set(sx).at[1].set(sy).at[2].set(sx).at[3].set(fy)
        )
        return state.replace(aux=aux)

    def action_map(p, action):
        return jnp.where(action == 3, 5, action)  # pickup -> toggle

    def post_step(p, key, prev, state: EnvState, action, reward, terminated):
        at_success = (state.agent_pos[0] == state.aux[0]) & (
            state.agent_pos[1] == state.aux[1]
        )
        at_failure = (state.agent_pos[0] == state.aux[2]) & (
            state.agent_pos[1] == state.aux[3]
        )
        reward = jnp.where(
            at_success, success_reward(state.step_count, p.max_steps), reward
        )
        reward = jnp.where(at_failure, 0.0, reward)
        terminated = terminated | at_success | at_failure
        return state, reward, terminated

    return Environment(
        env_id,
        params,
        generate,
        post_step=post_step,
        hook_rng=False,  # reward/termination override only — no randomness
        post_step_lanes=post_step,  # elementwise over per-env scalars
        action_map=action_map,
        mission_text=lambda c: MISSION,
    )
