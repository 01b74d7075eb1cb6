"""GoToObject (reference /root/reference/minigrid/envs/gotoobject.py).

numObjs objects with distinct (type, color); ``done`` next to the target
rewards, ``toggle`` terminates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_dynamicprogramming_tpu.core.constants import (
    IDX_TO_COLOR,
    OBJ_BALL,
    OBJ_BOX,
    OBJ_KEY,
)
from minigrid_dynamicprogramming_tpu.core.env import Environment
from minigrid_dynamicprogramming_tpu.core.state import EnvParams, new_state
from minigrid_dynamicprogramming_tpu.ops import grid as G
from minigrid_dynamicprogramming_tpu.ops.step import success_reward

TYPES = [OBJ_KEY, OBJ_BALL, OBJ_BOX]
TYPE_NAMES = {OBJ_KEY: "key", OBJ_BALL: "ball", OBJ_BOX: "box"}


def distinct_type_color_prefix(key: jax.Array, k: int, types=TYPES):
    """Uniform ordered sample of k distinct (type, color) combos — the
    branchless equivalent of the reference's rejection loop over already-used
    pairs (gotoobject.py _gen_grid)."""
    n = len(types) * 6
    perm = jax.random.permutation(key, n)[:k]
    t = jnp.asarray(types, dtype=jnp.int32)[perm // 6]
    c = (perm % 6).astype(jnp.int32)
    return t, c


def make_gotoobject(env_id: str, size: int = 6, num_objs: int = 2) -> Environment:
    params = EnvParams(
        width=size,
        height=size,
        max_steps=5 * size * size,
        see_through_walls=True,
    )

    def generate(key: jax.Array, p: EnvParams):
        keys = jax.random.split(key, num_objs + 4)
        state = new_state(p.height, p.width, rng=keys[-1])
        state = G.wall_rect(state, 0, 0, p.width, p.height)
        t, c = distinct_type_color_prefix(keys[0], num_objs)
        pos_x = jnp.zeros((num_objs,), jnp.int32)
        pos_y = jnp.zeros((num_objs,), jnp.int32)
        for i in range(num_objs):
            state, (x, y), _ = G.place_obj(keys[1 + i], state, t[i], c[i])
            pos_x = pos_x.at[i].set(x)
            pos_y = pos_y.at[i].set(y)
        state, _ = G.place_agent(keys[-3], state)
        tgt = jax.random.randint(keys[-2], (), 0, num_objs)
        aux = state.aux.at[0].set(pos_x[tgt]).at[1].set(pos_y[tgt])
        mission = state.mission.at[0].set(c[tgt]).at[1].set(t[tgt])
        return state.replace(aux=aux, mission=mission)

    def post_step(p, key, prev, state, action, reward, terminated):
        ax, ay = state.agent_pos[0], state.agent_pos[1]
        tx, ty = state.aux[0], state.aux[1]
        adjacent = ((ax == tx) & (jnp.abs(ay - ty) == 1)) | (
            (ay == ty) & (jnp.abs(ax - tx) == 1)
        )
        is_toggle = action == 5
        is_done = action == 6
        reward = jnp.where(
            is_done & adjacent,
            success_reward(state.step_count, p.max_steps),
            reward,
        )
        terminated = terminated | is_toggle | is_done
        return state, reward, terminated

    def mission_text(c) -> str:
        return f"go to the {IDX_TO_COLOR[int(c[0])]} {TYPE_NAMES[int(c[1])]}"

    return Environment(
        env_id,
        params,
        generate,
        post_step=post_step,
        hook_rng=False,  # reward/termination override only — no randomness
        post_step_lanes=post_step,  # elementwise over per-env scalars
        mission_text=mission_text,
    )
