"""LockedRoom (reference /root/reference/minigrid/envs/lockedroom.py).

19x19: a central hallway flanked by 2 columns of 3 rooms.  One room is locked
and holds the goal; the key (of the locked room's color) lies in another
room.  All six doors get distinct random colors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_dynamicprogramming_tpu.core.constants import (
    COLOR_GREEN,
    IDX_TO_COLOR,
    OBJ_DOOR,
    OBJ_GOAL,
    OBJ_KEY,
    STATE_CLOSED,
    STATE_LOCKED,
)
from minigrid_dynamicprogramming_tpu.core.env import Environment
from minigrid_dynamicprogramming_tpu.core.state import EnvParams, new_state
from minigrid_dynamicprogramming_tpu.ops import grid as G


def make_lockedroom(env_id: str, size: int = 19) -> Environment:
    params = EnvParams(
        width=size,
        height=size,
        max_steps=10 * size,
        see_through_walls=False,
    )

    lwall = size // 2 - 2
    rwall = size // 2 + 2
    room_w = lwall + 1
    room_h = size // 3 + 1
    # Six rooms: (top, door position); left column uses the lwall column for
    # doors, right column the rwall column (lockedroom.py:_gen_grid).
    rooms = []
    for n in range(3):
        j = n * (size // 3)
        rooms.append(((0, j), (lwall, j + 3)))
        rooms.append(((rwall, j), (rwall, j + 3)))

    def generate(key: jax.Array, p: EnvParams):
        keys = jax.random.split(key, 12)
        state = new_state(p.height, p.width, rng=keys[-1])
        state = G.wall_rect(state, 0, 0, size, size)
        state = G.vert_wall(state, lwall, 0)
        state = G.vert_wall(state, rwall, 0)
        for n in range(3):
            j = n * (size // 3)
            state = G.horz_wall(state, 0, j, lwall)
            state = G.horz_wall(state, rwall, j, size - rwall)

        locked_idx = jax.random.randint(keys[0], (), 0, 6)
        # Goal at a random interior cell of the locked room.
        gx = jax.random.randint(keys[1], (), 1, room_w - 1)
        gy = jax.random.randint(keys[2], (), 1, room_h - 1)
        tops = jnp.asarray([r[0] for r in rooms], dtype=jnp.int32)
        doors = jnp.asarray([r[1] for r in rooms], dtype=jnp.int32)
        goal_x = tops[locked_idx, 0] + gx
        goal_y = tops[locked_idx, 1] + gy
        state = G.put_obj(state, goal_x, goal_y, OBJ_GOAL, COLOR_GREEN)

        # Distinct colors for the six doors (sequential no-replacement draws
        # == a permutation of the 6 colors).
        colors = jax.random.permutation(keys[3], 6)
        for i in range(6):
            is_locked = locked_idx == i
            state = G.put_obj(
                state,
                doors[i, 0],
                doors[i, 1],
                OBJ_DOOR,
                colors[i],
                jnp.where(is_locked, STATE_LOCKED, STATE_CLOSED),
            )

        # Key room != locked room; key colored like the locked door.
        offset = jax.random.randint(keys[4], (), 1, 6)
        key_idx = (locked_idx + offset) % 6
        kx = jax.random.randint(keys[5], (), 1, room_w - 1)
        ky = jax.random.randint(keys[6], (), 1, room_h - 1)
        state = G.put_obj(
            state,
            tops[key_idx, 0] + kx,
            tops[key_idx, 1] + ky,
            OBJ_KEY,
            colors[locked_idx],
        )

        # Agent in the hallway band.
        ys, xs = G.coord_grids(p.height, p.width)
        hallway = (xs >= lwall) & (xs < rwall)
        state, _ = G.place_agent(keys[7], state, reject_mask=~hallway)

        mission = (
            state.mission.at[0].set(colors[locked_idx]).at[1].set(colors[key_idx])
        )
        return state.replace(mission=mission)

    def mission_text(c) -> str:
        lc = IDX_TO_COLOR[int(c[0])]
        kc = IDX_TO_COLOR[int(c[1])]
        return (
            f"get the {lc} key from the {kc} room, unlock the {lc} door and "
            f"go to the goal"
        )

    return Environment(env_id, params, generate, mission_text=mission_text)
