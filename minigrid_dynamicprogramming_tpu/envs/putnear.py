"""PutNear (reference /root/reference/minigrid/envs/putnear.py).

numObjs distinct (type, color) objects placed pairwise non-adjacent; the
agent must pick up the move object and drop it within chebyshev distance 1 of
the target.  Picking up the wrong object terminates; any drop while carrying
terminates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_dynamicprogramming_tpu.core.constants import (
    IDX_TO_COLOR,
    OBJ_EMPTY,
)
from minigrid_dynamicprogramming_tpu.core.env import Environment
from minigrid_dynamicprogramming_tpu.core.state import EnvParams, new_state
from minigrid_dynamicprogramming_tpu.ops import agnostic as AG
from minigrid_dynamicprogramming_tpu.ops import grid as G
from minigrid_dynamicprogramming_tpu.ops.step import success_reward
from minigrid_dynamicprogramming_tpu.envs.gotoobject import (
    TYPE_NAMES,
    distinct_type_color_prefix,
)


def make_putnear(env_id: str, size: int = 6, num_objs: int = 2) -> Environment:
    params = EnvParams(
        width=size,
        height=size,
        max_steps=5 * size,
        see_through_walls=True,
    )

    def generate(key: jax.Array, p: EnvParams):
        keys = jax.random.split(key, num_objs + 5)
        state = new_state(p.height, p.width, rng=keys[-1])
        state = G.wall_rect(state, 0, 0, p.width, p.height)
        t, c = distinct_type_color_prefix(keys[0], num_objs)
        ys, xs = G.coord_grids(p.height, p.width)
        near_any = jnp.zeros((p.height, p.width), dtype=bool)
        pos_x = jnp.zeros((num_objs,), jnp.int32)
        pos_y = jnp.zeros((num_objs,), jnp.int32)
        for i in range(num_objs):
            # reject_fn near_obj: no cell within chebyshev 1 of a previous
            # object (putnear.py:near_obj).
            state, (x, y), _ = G.place_obj(
                keys[1 + i], state, t[i], c[i], reject_mask=near_any
            )
            pos_x = pos_x.at[i].set(x)
            pos_y = pos_y.at[i].set(y)
            near_any = near_any | (
                (jnp.abs(xs - x) <= 1) & (jnp.abs(ys - y) <= 1)
            )
        state, _ = G.place_agent(keys[-4], state)
        move_idx = jax.random.randint(keys[-3], (), 0, num_objs)
        # targetIdx resampled until != objIdx == uniform over the others.
        offset = jax.random.randint(keys[-2], (), 1, num_objs)
        target_idx = (move_idx + offset) % num_objs
        aux = (
            state.aux.at[0]
            .set(t[move_idx])
            .at[1]
            .set(c[move_idx])
            .at[2]
            .set(pos_x[target_idx])
            .at[3]
            .set(pos_y[target_idx])
        )
        mission = (
            state.mission.at[0]
            .set(c[move_idx])
            .at[1]
            .set(t[move_idx])
            .at[2]
            .set(c[target_idx])
            .at[3]
            .set(t[target_idx])
        )
        return state.replace(aux=aux, mission=mission)

    def post_step(p, key, prev, state, action, reward, terminated):
        is_pickup = action == 3
        is_drop = action == 4
        carrying_after = state.carrying_obj != OBJ_EMPTY
        pre_carrying = prev.carrying_obj != OBJ_EMPTY
        wrong = (
            (state.carrying_obj.astype(jnp.int32) != state.aux[0])
            | (state.carrying_color.astype(jnp.int32) != state.aux[1])
        )
        terminated = terminated | (is_pickup & carrying_after & wrong)

        # Drop resolution (putnear.py:step): reward iff the drop landed
        # (front was empty) within chebyshev 1 of the target.
        dx, dy = AG.dir_vec(state.agent_dir)
        ax, ay = AG.agent_xy(state)
        ox = ax + dx
        oy = ay + dy
        dropped = is_drop & pre_carrying & (~carrying_after)
        near_target = (jnp.abs(ox - state.aux[2]) <= 1) & (
            jnp.abs(oy - state.aux[3]) <= 1
        )
        reward = jnp.where(
            dropped & near_target,
            success_reward(state.step_count, p.max_steps),
            reward,
        )
        terminated = terminated | (is_drop & pre_carrying)
        return state, reward, terminated

    def mission_text(c) -> str:
        return (
            f"put the {IDX_TO_COLOR[int(c[0])]} {TYPE_NAMES[int(c[1])]} near "
            f"the {IDX_TO_COLOR[int(c[2])]} {TYPE_NAMES[int(c[3])]}"
        )

    return Environment(
        env_id,
        params,
        generate,
        post_step=post_step,
        hook_rng=False,  # reward/termination override only — no randomness
        post_step_lanes=post_step,  # layout-polymorphic via AG helpers
        mission_text=mission_text,
    )
