"""ObstructedMaze family (reference
/root/reference/minigrid/envs/obstructedmaze.py:9-271 and
obstructedmaze_v1.py:9-99).

6x6-room mazes with locked doors whose keys may hide in grey boxes, and
blue-ball targets; blocking green balls can sit in front of doors.  The v0
variants replicate the reference's generation order exactly — including its
known flaw where a later blocking ball can overwrite a key box — while the v1
variants place all doors+blockers before any keys (the upstream fix), which
the solvability distribution test checks.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from minigrid_dynamicprogramming_tpu.core.constants import (
    COLOR_TO_IDX,
    DIR_TO_VEC_ARR,
    OBJ_BALL,
    OBJ_BOX,
    OBJ_KEY,
)
from minigrid_dynamicprogramming_tpu.core.env import Environment
from minigrid_dynamicprogramming_tpu.core.state import EnvParams, new_state
from minigrid_dynamicprogramming_tpu.ops import grid as G
from minigrid_dynamicprogramming_tpu.ops import roomgrid as RG
from minigrid_dynamicprogramming_tpu.envs.keycorridor import (
    pickup_target_post_step,
)

ROOM_SIZE = 6
# COLOR_NAMES is sorted alphabetically (constants.py:17):
# [blue, green, grey, purple, red, yellow]
SORTED_COLOR_IDS = [COLOR_TO_IDX[c] for c in sorted(COLOR_TO_IDX)]
BALL_TO_FIND = SORTED_COLOR_IDS[0]  # blue
BLOCKING_BALL = SORTED_COLOR_IDS[1]  # green
BOX_COLOR = SORTED_COLOR_IDS[2]  # grey


def _door_colors(key: jax.Array) -> jnp.ndarray:
    """rand_subset(COLOR_NAMES, 6) — a permutation of the sorted color list
    (obstructedmaze.py:_gen_grid)."""
    perm = jax.random.permutation(key, 6)
    return jnp.asarray(SORTED_COLOR_IDS, dtype=jnp.int32)[perm]


def _add_obstructed_door(
    key,
    state,
    ctx,
    i,
    j,
    door_idx,
    color,
    key_in_box: bool,
    blocked: bool,
    place_key: bool = True,
):
    """ObstructedMazeEnv.add_door override (obstructedmaze.py:136-167):
    locked door + optional blocking ball + key (possibly inside a grey box)
    placed in room (i, j)."""
    k_door, k_key = jax.random.split(key)
    state, ctx, (dx, dy), color, door_idx_out = RG.add_door(
        k_door, state, ctx, i, j, door_idx=door_idx, color=color, locked=True
    )
    if blocked:
        vec = DIR_TO_VEC_ARR[door_idx]
        state = G.put_obj(state, dx - vec[0], dy - vec[1], OBJ_BALL, BLOCKING_BALL)
    if place_key:
        state, ctx = _add_key(k_key, state, ctx, i, j, color, key_in_box)
    return state, ctx, (dx, dy), color


def _add_key(key, state, ctx, i, j, color, key_in_box: bool):
    if key_in_box:
        state, ctx, _, _ = RG.place_in_room(
            key,
            state,
            ctx,
            ROOM_SIZE,
            i,
            j,
            OBJ_BOX,
            BOX_COLOR,
            contains_obj=OBJ_KEY,
            contains_color=color,
        )
    else:
        state, ctx, _, _ = RG.place_in_room(
            key, state, ctx, ROOM_SIZE, i, j, OBJ_KEY, color
        )
    return state, ctx


def _finish(state, ball_color):
    aux = state.aux.at[0].set(OBJ_BALL).at[1].set(ball_color)
    mission = state.mission.at[0].set(ball_color)
    return state.replace(aux=aux, mission=mission)


def make_obstructedmaze_1d(
    env_id: str, key_in_box: bool, blocked: bool
) -> Environment:
    """1Dl / 1Dlh / 1Dlhb (obstructedmaze.py:ObstructedMaze_1Dlhb)."""
    params = EnvParams(
        width=(ROOM_SIZE - 1) * 2 + 1,
        height=ROOM_SIZE,
        max_steps=4 * 2 * ROOM_SIZE * ROOM_SIZE,
        see_through_walls=False,
    )

    def generate(key: jax.Array, p: EnvParams):
        keys = jax.random.split(key, 6)
        state = new_state(p.height, p.width, rng=keys[-1])
        state, ctx = RG.init(keys[0], state, ROOM_SIZE, 1, 2)
        door_colors = _door_colors(keys[1])
        state, ctx, _, _ = _add_obstructed_door(
            keys[2], state, ctx, 0, 0, 0, door_colors[0], key_in_box, blocked
        )
        state, ctx, _, _, _ = RG.add_object(
            keys[3], state, ctx, ROOM_SIZE, 1, 0, kind=OBJ_BALL, color=BALL_TO_FIND
        )
        state = RG.place_agent(keys[4], state, ROOM_SIZE, 0, 0)
        return _finish(state, BALL_TO_FIND)

    return Environment(
        env_id,
        params,
        generate,
        post_step=(hook := pickup_target_post_step(params)),
        hook_rng=False,  # reward/termination override only — no randomness
        post_step_lanes=hook,  # elementwise over per-env scalars
        mission_text=lambda c: "pick up the blue ball",
    )


def make_obstructedmaze_full(
    env_id: str,
    agent_room: Tuple[int, int] = (1, 1),
    key_in_box: bool = True,
    blocked: bool = True,
    num_quarters: int = 4,
    num_rooms_visited: int = 25,
    v1: bool = False,
) -> Environment:
    """ObstructedMaze_Full, v0 (obstructedmaze.py:171-230) and v1
    (obstructedmaze_v1.py:9-99 — doors+blockers before keys)."""
    rows = cols = 3
    params = EnvParams(
        width=(ROOM_SIZE - 1) * cols + 1,
        height=(ROOM_SIZE - 1) * rows + 1,
        max_steps=4 * num_rooms_visited * ROOM_SIZE * ROOM_SIZE,
        see_through_walls=False,
    )
    middle = (1, 1)
    side_rooms = [(2, 1), (1, 2), (0, 1), (1, 0)][:num_quarters]
    corners = [(2, 0), (2, 2), (0, 2), (0, 0)][:num_quarters]

    def generate(key: jax.Array, p: EnvParams):
        keys = jax.random.split(key, 6 + 6 * len(side_rooms))
        state = new_state(p.height, p.width, rng=keys[-1])
        state, ctx = RG.init(keys[0], state, ROOM_SIZE, rows, cols)
        door_colors = _door_colors(keys[1])
        kn = 2
        for i, side in enumerate(side_rooms):
            state, ctx, _, _, _ = RG.add_door(
                keys[kn], state, ctx, middle[0], middle[1],
                door_idx=i, color=door_colors[i], locked=False,
            )
            kn += 1
            if not v1:
                # v0 order: (door+blocker+key) for k=-1 then k=+1.
                for k in (-1, 1):
                    state, ctx, _, _ = _add_obstructed_door(
                        keys[kn], state, ctx, side[0], side[1],
                        (i + k) % 4, door_colors[(i + k) % 6],
                        key_in_box, blocked,
                    )
                    kn += 1
            else:
                # v1 order: both doors+blockers first, then both keys
                # (obstructedmaze_v1.py:37-75).
                for k in (-1, 1):
                    state, ctx, _, _ = _add_obstructed_door(
                        keys[kn], state, ctx, side[0], side[1],
                        (i + k) % 4, door_colors[(i + k) % 6],
                        key_in_box, blocked, place_key=False,
                    )
                    kn += 1
                for k in (-1, 1):
                    state, ctx = _add_key(
                        jax.random.fold_in(keys[kn - 1], k % 4),
                        state, ctx, side[0], side[1],
                        door_colors[(i + k) % 6], key_in_box,
                    )
        ball_room = jnp.asarray(corners, dtype=jnp.int32)[
            jax.random.randint(keys[kn], (), 0, len(corners))
        ]
        state, ctx, _, _, _ = RG.add_object(
            keys[kn + 1], state, ctx, ROOM_SIZE,
            ball_room[0], ball_room[1], kind=OBJ_BALL, color=BALL_TO_FIND,
        )
        state = RG.place_agent(
            keys[kn + 2], state, ROOM_SIZE, agent_room[0], agent_room[1]
        )
        return _finish(state, BALL_TO_FIND)

    return Environment(
        env_id,
        params,
        generate,
        post_step=(hook := pickup_target_post_step(params)),
        hook_rng=False,  # reward/termination override only — no randomness
        post_step_lanes=hook,  # elementwise over per-env scalars
        mission_text=lambda c: "pick up the blue ball",
    )
