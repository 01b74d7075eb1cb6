"""Unlock / UnlockPickup / BlockedUnlockPickup (reference
/root/reference/minigrid/envs/{unlock,unlockpickup,blockedunlockpickup}.py).

1x2 RoomGrid with a locked door between the rooms and the matching key on the
left; UnlockPickup adds a target box on the right, BlockedUnlockPickup also
blocks the door with a ball.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_dynamicprogramming_tpu.core.constants import (
    IDX_TO_COLOR,
    OBJ_BALL,
    OBJ_BOX,
    OBJ_KEY,
    STATE_OPEN,
)
from minigrid_dynamicprogramming_tpu.core.env import Environment
from minigrid_dynamicprogramming_tpu.core.state import EnvParams, new_state
from minigrid_dynamicprogramming_tpu.ops import agnostic as AG
from minigrid_dynamicprogramming_tpu.ops import grid as G
from minigrid_dynamicprogramming_tpu.ops import roomgrid as RG
from minigrid_dynamicprogramming_tpu.ops.step import success_reward
from minigrid_dynamicprogramming_tpu.envs.keycorridor import (
    pickup_target_post_step,
)

ROOM_SIZE = 6


def _params(max_steps_mult: int) -> EnvParams:
    return EnvParams(
        width=(ROOM_SIZE - 1) * 2 + 1,
        height=ROOM_SIZE,
        max_steps=max_steps_mult * ROOM_SIZE * ROOM_SIZE,
        see_through_walls=False,
    )


def make_unlock(env_id: str) -> Environment:
    params = _params(8)

    def generate(key: jax.Array, p: EnvParams):
        keys = jax.random.split(key, 5)
        state = new_state(p.height, p.width, rng=keys[-1])
        state, ctx = RG.init(keys[0], state, ROOM_SIZE, 1, 2)
        state, ctx, (dx, dy), door_color, _ = RG.add_door(
            keys[1], state, ctx, 0, 0, door_idx=0, locked=True
        )
        state, ctx, _, _, _ = RG.add_object(
            keys[2], state, ctx, ROOM_SIZE, 0, 0, kind=OBJ_KEY, color=door_color
        )
        state = RG.place_agent(keys[3], state, ROOM_SIZE, 0, 0)
        aux = state.aux.at[0].set(dx).at[1].set(dy)
        return state.replace(aux=aux)

    def post_step(p, key, prev, state, action, reward, terminated):
        # toggle while the door ends up open (unlock.py:89-97).
        door_open = (
            AG.read_cell(p, state, "grid_state", state.aux[0], state.aux[1])
            == STATE_OPEN
        )
        won = (action == 5) & door_open
        reward = jnp.where(
            won, success_reward(state.step_count, p.max_steps), reward
        )
        return state, reward, terminated | won

    return Environment(
        env_id,
        params,
        generate,
        post_step=post_step,
        hook_rng=False,  # reward/termination override only — no randomness
        post_step_lanes=post_step,  # layout-polymorphic via AG.read_cell
        mission_text=lambda c: "open the door",
    )


def _make_pickup_variant(env_id: str, blocked: bool) -> Environment:
    params = _params(16 if blocked else 8)

    def generate(key: jax.Array, p: EnvParams):
        keys = jax.random.split(key, 7)
        state = new_state(p.height, p.width, rng=keys[-1])
        state, ctx = RG.init(keys[0], state, ROOM_SIZE, 1, 2)
        state, ctx, _, kind, box_color = RG.add_object(
            keys[1], state, ctx, ROOM_SIZE, 1, 0, kind=OBJ_BOX
        )
        state, ctx, (dx, dy), door_color, _ = RG.add_door(
            keys[2], state, ctx, 0, 0, door_idx=0, locked=True
        )
        if blocked:
            # Ball directly left of the door (blockedunlockpickup.py:90-116).
            ball_color = jax.random.randint(keys[3], (), 0, 6)
            state = G.put_obj(state, dx - 1, dy, OBJ_BALL, ball_color)
        state, ctx, _, _, _ = RG.add_object(
            keys[4], state, ctx, ROOM_SIZE, 0, 0, kind=OBJ_KEY, color=door_color
        )
        state = RG.place_agent(keys[5], state, ROOM_SIZE, 0, 0)
        aux = state.aux.at[0].set(OBJ_BOX).at[1].set(box_color)
        mission = state.mission.at[0].set(box_color)
        return state.replace(aux=aux, mission=mission)

    hook = pickup_target_post_step(params)
    return Environment(
        env_id,
        params,
        generate,
        post_step=hook,
        hook_rng=False,  # reward/termination override only — no randomness
        post_step_lanes=hook,  # elementwise over per-env scalars
        mission_text=lambda c: f"pick up the {IDX_TO_COLOR[int(c[0])]} box",
    )


def make_unlockpickup(env_id: str) -> Environment:
    return _make_pickup_variant(env_id, blocked=False)


def make_blockedunlockpickup(env_id: str) -> Environment:
    return _make_pickup_variant(env_id, blocked=True)
