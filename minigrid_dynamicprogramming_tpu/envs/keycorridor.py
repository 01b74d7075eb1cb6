"""KeyCorridor (reference /root/reference/minigrid/envs/keycorridor.py:8-137).

3-column RoomGrid whose middle column is merged into a corridor; the target
object sits behind a locked door on the right, the key in a left room.
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
from minigrid_dynamicprogramming_tpu.ops import roomgrid as RG
from minigrid_dynamicprogramming_tpu.ops.step import success_reward

TYPE_NAMES = {5: "key", 6: "ball", 7: "box"}


def pickup_target_post_step(p: EnvParams):
    """Shared hook: ``pickup`` while carrying the aux-designated target
    rewards and terminates (keycorridor.py:129-137 and the Unlock*/
    ObstructedMaze step overrides)."""

    def post_step(params, key, prev, state, action, reward, terminated):
        got = (
            (action == 3)
            & (state.carrying_obj.astype(jnp.int32) == state.aux[0])
            & (state.carrying_color.astype(jnp.int32) == state.aux[1])
            & (state.carrying_obj != OBJ_EMPTY)
        )
        reward = jnp.where(
            got, success_reward(state.step_count, params.max_steps), reward
        )
        return state, reward, terminated | got

    return post_step


def make_keycorridor(
    env_id: str, room_size: int = 6, num_rows: int = 3, obj_type: int = OBJ_BALL
) -> Environment:
    num_cols = 3
    params = EnvParams(
        width=(room_size - 1) * num_cols + 1,
        height=(room_size - 1) * num_rows + 1,
        max_steps=30 * room_size * room_size,
        see_through_walls=False,
    )

    def generate(key: jax.Array, p: EnvParams):
        keys = jax.random.split(key, 8)
        state = new_state(p.height, p.width, rng=keys[-1])
        state, ctx = RG.init(keys[0], state, room_size, num_rows, num_cols)
        # Merge middle column into a corridor (keycorridor.py:107-109).
        for j in range(1, num_rows):
            state, ctx = RG.remove_wall(state, ctx, room_size, 1, j, 3)
        room_idx = jax.random.randint(keys[1], (), 0, num_rows)
        state, ctx, _, door_color, _ = RG.add_door(
            keys[2], state, ctx, 2, room_idx, door_idx=2, locked=True
        )
        state, ctx, _, kind, color = RG.add_object(
            keys[3], state, ctx, room_size, 2, room_idx, kind=obj_type
        )
        key_row = jax.random.randint(keys[4], (), 0, num_rows)
        state, ctx, _, _, _ = RG.add_object(
            keys[5], state, ctx, room_size, 0, key_row, kind=OBJ_KEY, color=door_color
        )
        state = RG.place_agent(keys[6], state, room_size, 1, num_rows // 2)
        state, ctx = RG.connect_all(keys[7], state, ctx, room_size)
        aux = state.aux.at[0].set(kind).at[1].set(color)
        mission = state.mission.at[0].set(color).at[1].set(kind)
        return state.replace(aux=aux, mission=mission)

    def mission_text(c) -> str:
        return f"pick up the {IDX_TO_COLOR[int(c[0])]} {TYPE_NAMES[int(c[1])]}"

    hook = pickup_target_post_step(params)
    return Environment(
        env_id,
        params,
        generate,
        post_step=hook,
        hook_rng=False,  # reward/termination override only — no randomness
        post_step_lanes=hook,  # elementwise over per-env scalars
        mission_text=mission_text,
    )
