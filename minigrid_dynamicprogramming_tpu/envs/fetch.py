"""Fetch (reference /root/reference/minigrid/envs/fetch.py).

numObjs random keys/balls (duplicates allowed); picking up the target
(type, color) rewards and terminates, picking up anything else terminates
with 0.  Mission string uses one of five syntax templates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_dynamicprogramming_tpu.core.constants import (
    IDX_TO_COLOR,
    OBJ_BALL,
    OBJ_EMPTY,
    OBJ_KEY,
)
from minigrid_dynamicprogramming_tpu.core.env import Environment
from minigrid_dynamicprogramming_tpu.core.state import EnvParams, new_state
from minigrid_dynamicprogramming_tpu.ops import grid as G
from minigrid_dynamicprogramming_tpu.ops.step import success_reward

SYNTAX = ["get a", "go get a", "fetch a", "go fetch a", "you must fetch a"]
OBJ_TYPES = [OBJ_KEY, OBJ_BALL]
TYPE_NAMES = {OBJ_KEY: "key", OBJ_BALL: "ball"}


def make_fetch(env_id: str, size: int = 8, num_objs: int = 3) -> Environment:
    params = EnvParams(
        width=size,
        height=size,
        max_steps=5 * size * size,
        see_through_walls=True,
    )

    def generate(key: jax.Array, p: EnvParams):
        keys = jax.random.split(key, 2 * num_objs + 5)
        state = new_state(p.height, p.width, rng=keys[-1])
        state = G.wall_rect(state, 0, 0, p.width, p.height)
        types = jnp.zeros((num_objs,), dtype=jnp.int32)
        colors = jnp.zeros((num_objs,), dtype=jnp.int32)
        for i in range(num_objs):
            t = jnp.asarray(OBJ_TYPES, dtype=jnp.int32)[
                jax.random.randint(keys[2 * i], (), 0, 2)
            ]
            c = jax.random.randint(keys[2 * i + 1], (), 0, 6)
            types = types.at[i].set(t)
            colors = colors.at[i].set(c)
            state, _, _ = G.place_obj(
                jax.random.fold_in(keys[2 * i], 1), state, t, c
            )
        state, _ = G.place_agent(keys[-2], state)
        tgt = jax.random.randint(keys[-3], (), 0, num_objs)
        syntax = jax.random.randint(keys[-4], (), 0, 5)
        mission = (
            state.mission.at[0]
            .set(syntax)
            .at[1]
            .set(colors[tgt])
            .at[2]
            .set(types[tgt])
        )
        aux = state.aux.at[0].set(types[tgt]).at[1].set(colors[tgt])
        return state.replace(mission=mission, aux=aux)

    def post_step(p, key, prev, state, action, reward, terminated):
        # Any step ending with something in hand resolves the episode
        # (fetch.py:162-176).
        carrying = state.carrying_obj != OBJ_EMPTY
        match = (
            (state.carrying_obj.astype(jnp.int32) == state.aux[0])
            & (state.carrying_color.astype(jnp.int32) == state.aux[1])
        )
        reward = jnp.where(
            carrying & match,
            success_reward(state.step_count, p.max_steps),
            jnp.where(carrying, 0.0, reward),
        )
        terminated = terminated | carrying
        return state, reward, terminated

    def mission_text(codes) -> str:
        return (
            f"{SYNTAX[int(codes[0])]} {IDX_TO_COLOR[int(codes[1])]} "
            f"{TYPE_NAMES[int(codes[2])]}"
        )

    return Environment(
        env_id,
        params,
        generate,
        post_step=post_step,
        hook_rng=False,  # reward/termination override only — no randomness
        post_step_lanes=post_step,  # elementwise over per-env scalars
        mission_text=mission_text,
    )
