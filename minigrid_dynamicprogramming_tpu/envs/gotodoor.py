"""GoToDoor (reference /root/reference/minigrid/envs/gotodoor.py).

A room of random effective size (>= 5) inside the grid, four doors of
distinct colors centered on the four walls; ``done`` next to the target door
rewards, ``toggle`` terminates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_dynamicprogramming_tpu.core.constants import (
    COLOR_GREY,
    IDX_TO_COLOR,
    OBJ_DOOR,
    OBJ_WALL,
    STATE_CLOSED,
)
from minigrid_dynamicprogramming_tpu.core.env import Environment
from minigrid_dynamicprogramming_tpu.core.state import EnvParams, new_state
from minigrid_dynamicprogramming_tpu.ops import grid as G
from minigrid_dynamicprogramming_tpu.ops.step import success_reward


def make_gotodoor(env_id: str, size: int = 5) -> Environment:
    assert size >= 5
    params = EnvParams(
        width=size,
        height=size,
        max_steps=4 * size * size,
        see_through_walls=True,
    )

    def generate(key: jax.Array, p: EnvParams):
        keys = jax.random.split(key, 10)
        state = new_state(p.height, p.width, rng=keys[-1])
        # Random effective room size in [5, size] (gotodoor.py _gen_grid).
        rw = jax.random.randint(keys[0], (), 5, p.width + 1)
        rh = jax.random.randint(keys[1], (), 5, p.height + 1)
        ys, xs = G.coord_grids(p.height, p.width)
        border = ((xs == 0) | (xs == rw - 1) | (ys == 0) | (ys == rh - 1)) & (
            (xs < rw) & (ys < rh)
        )
        state = G.paint(state, border, OBJ_WALL, COLOR_GREY)

        # Four door positions on the four walls.
        dx_top = jax.random.randint(keys[2], (), 2, rw - 2)
        dx_bot = jax.random.randint(keys[3], (), 2, rw - 2)
        dy_left = jax.random.randint(keys[4], (), 2, rh - 2)
        dy_right = jax.random.randint(keys[5], (), 2, rh - 2)
        door_x = jnp.stack([dx_top, dx_bot, jnp.zeros((), jnp.int32), rw - 1])
        door_y = jnp.stack([jnp.zeros((), jnp.int32), rh - 1, dy_left, dy_right])
        # Four distinct colors = prefix of a color permutation.
        door_colors = jax.random.permutation(keys[6], 6)[:4]
        for i in range(4):
            state = G.put_obj(
                state, door_x[i], door_y[i], OBJ_DOOR, door_colors[i], STATE_CLOSED
            )

        # Agent anywhere empty inside the effective room rect.
        inside = (xs < rw) & (ys < rh)
        state, _ = G.place_agent(keys[7], state, reject_mask=~inside)

        tgt = jax.random.randint(keys[8], (), 0, 4)
        aux = (
            state.aux.at[0].set(door_x[tgt]).at[1].set(door_y[tgt])
        )
        mission = state.mission.at[0].set(door_colors[tgt])
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

    return Environment(
        env_id,
        params,
        generate,
        post_step=post_step,
        hook_rng=False,  # reward/termination override only — no randomness
        post_step_lanes=post_step,  # elementwise over per-env scalars
        mission_text=lambda c: f"go to the {IDX_TO_COLOR[int(c[0])]} door",
    )
