"""BabyAI Unlock levels (reference /root/reference/minigrid/envs/babyai/unlock.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_dynamicprogramming_tpu.core.constants import (
    OBJ_BALL,
    OBJ_BOX,
    OBJ_DOOR,
    OBJ_KEY,
)
from minigrid_dynamicprogramming_tpu.core.env import Environment
from minigrid_dynamicprogramming_tpu.envs.babyai import core as B
from minigrid_dynamicprogramming_tpu.envs.babyai.level import (
    make_level,
    objs_reachable,
)
from minigrid_dynamicprogramming_tpu.envs.babyai.open import rand_color_subset
from minigrid_dynamicprogramming_tpu.ops import grid as G
from minigrid_dynamicprogramming_tpu.ops import roomgrid as rg


def _open_codes(color):
    return B.instr_codes(
        B.COMB_SINGLE, B.clause(B.KIND_OPEN, d1=(OBJ_DOOR, color, 0))
    )


def _pickup_codes(kind, color):
    return B.instr_codes(
        B.COMB_SINGLE, B.clause(B.KIND_PICKUP, d1=(kind, color, 0))
    )


def make_unlock(
    env_id: str, room_size: int = 8, num_rows: int = 3, num_cols: int = 3
) -> Environment:
    """unlock.py Unlock — open a locked door whose key sits in another room;
    with 50% probability the locked door's color is globally unique."""

    def gen(key, p, state, ctx):
        (k_room, k_room2, k_door, k_keyroom, k_key, k_uniq, k_conn,
         k_dists, k_agentroom, k_agent) = jax.random.split(key, 10)
        id_ = jax.random.randint(k_room, (), 0, num_cols)
        jd = jax.random.randint(k_room2, (), 0, num_rows)
        state, ctx, _, door_color, _ = rg.add_door(
            k_door, state, ctx, id_, jd, locked=True
        )
        rooms = jnp.arange(num_rows * num_cols)
        ri = rooms % num_cols
        rj = rooms // num_cols
        valid = ~((ri == id_) & (rj == jd))
        pick = jax.random.categorical(k_keyroom, jnp.where(valid, 0.0, -jnp.inf))
        state, ctx, _, _ = rg.place_in_room(
            k_key, state, ctx, room_size, ri[pick], rj[pick], OBJ_KEY, door_color
        )
        # 50%: connect_all avoids the locked door's color (unlock.py:31-36).
        unique = jax.random.randint(k_uniq, (), 0, 2) == 0
        exclude = jnp.where(unique, door_color, -1)
        state, ctx = rg.connect_all(
            k_conn, state, ctx, room_size, exclude_color=exclude
        )
        # 3 distractors per non-locked room (unlock.py:38-45).
        dk = jax.random.split(k_dists, num_rows * num_cols)
        room_is = jnp.arange(num_rows * num_cols) % num_cols
        room_js = jnp.arange(num_rows * num_cols) // num_cols

        def per_room(carry, inp):
            state, ctx = carry
            k, i, j = inp
            sub, sub_ctx = state, ctx
            for kk in jax.random.split(k, 3):
                kkk, kkc, kkp = jax.random.split(kk, 3)
                kind = rg.OBJ_KINDS[jax.random.randint(kkk, (), 0, 3)]
                color = jax.random.randint(kkc, (), 0, 6)
                sub, sub_ctx, _, _ = rg.place_in_room(
                    kkp, sub, sub_ctx, room_size, i, j, kind, color
                )
            skip = (i == id_) & (j == jd)
            state = jax.tree_util.tree_map(
                lambda a, b: jnp.where(skip, b, a), sub, state
            )
            ctx = jax.tree_util.tree_map(
                lambda a, b: jnp.where(skip, b, a), sub_ctx, ctx
            )
            return (state, ctx), None

        (state, ctx), _ = jax.lax.scan(per_room, (state, ctx), (dk, room_is, room_js))
        apick = jax.random.categorical(k_agentroom, jnp.where(valid, 0.0, -jnp.inf))
        state = rg.place_agent(
            k_agent, state, room_size, i=ri[apick], j=rj[apick],
            rows=num_rows, cols=num_cols,
        )
        ok = objs_reachable(state)
        return state, _open_codes(door_color), ok

    return make_level(env_id, gen, room_size, num_rows, num_cols, instr_profile=B.single_profile("open"))


def make_unlock_local(env_id: str, distractors: bool = False) -> Environment:
    """unlock.py UnlockLocal — key and locked door in the same room."""
    room_size = 8

    def gen(key, p, state, ctx):
        k_door, k_key, k_dist, k_agent = jax.random.split(key, 4)
        state, ctx, _, door_color, _ = rg.add_door(
            k_door, state, ctx, 1, 1, locked=True
        )
        state, ctx, _, _ = rg.place_in_room(
            k_key, state, ctx, room_size, 1, 1, OBJ_KEY, door_color
        )
        if distractors:
            state, ctx, _, _, _ = rg.add_distractors(
                k_dist, state, ctx, room_size, 3, 3, 1, 1,
                num_distractors=3, all_unique=True,
            )
        state = rg.place_agent(k_agent, state, room_size, i=1, j=1, rows=3, cols=3)
        return state, _open_codes(B.COLOR_ANY), jnp.asarray(True)

    return make_level(env_id, gen, room_size, 3, 3, instr_profile=B.single_profile("open"))


def make_key_in_box(env_id: str) -> Environment:
    """unlock.py KeyInBox — the matching key hides inside a box."""
    room_size = 8

    def gen(key, p, state, ctx):
        k_door, k_boxc, k_box, k_agent = jax.random.split(key, 4)
        state, ctx, _, door_color, _ = rg.add_door(
            k_door, state, ctx, 1, 1, locked=True
        )
        box_color = jax.random.randint(k_boxc, (), 0, 6)
        state, ctx, _, _ = rg.place_in_room(
            k_box, state, ctx, room_size, 1, 1, OBJ_BOX, box_color,
            contains_obj=OBJ_KEY, contains_color=door_color,
        )
        state = rg.place_agent(k_agent, state, room_size, i=1, j=1, rows=3, cols=3)
        return state, _open_codes(B.COLOR_ANY), jnp.asarray(True)

    return make_level(env_id, gen, room_size, 3, 3, instr_profile=B.single_profile("open"))


def make_unlock_pickup(env_id: str, distractors: bool = False) -> Environment:
    """unlock.py UnlockPickup — box behind a locked door.  (The reference's
    ``if max is None`` bug pins max_steps to 8 * room_size**2.)"""
    room_size = 6

    def gen(key, p, state, ctx):
        k_obj, k_door, k_key, k_dist, k_agent = jax.random.split(key, 5)
        state, ctx, _, _, box_color = rg.add_object(
            k_obj, state, ctx, room_size, 1, 0, kind=OBJ_BOX
        )
        state, ctx, _, door_color, _ = rg.add_door(
            k_door, state, ctx, 0, 0, door_idx=0, locked=True
        )
        state, ctx, _, _ = rg.place_in_room(
            k_key, state, ctx, room_size, 0, 0, OBJ_KEY, door_color
        )
        if distractors:
            state, ctx, _, _, _ = rg.add_distractors(
                k_dist, state, ctx, room_size, 1, 2,
                num_distractors=4, all_unique=True,
            )
        state = rg.place_agent(k_agent, state, room_size, i=0, j=0, rows=1, cols=2)
        return state, _pickup_codes(OBJ_BOX, box_color), jnp.asarray(True)

    return make_level(env_id, gen, room_size, 1, 2, max_steps=8 * room_size**2, instr_profile=B.single_profile("pickup"))


def make_blocked_unlock_pickup(env_id: str) -> Environment:
    """unlock.py BlockedUnlockPickup — a ball blocks the locked door."""
    room_size = 6

    def gen(key, p, state, ctx):
        k_obj, k_door, k_ballc, k_key, k_agent = jax.random.split(key, 5)
        state, ctx, _, _, _ = rg.add_object(
            k_obj, state, ctx, room_size, 1, 0, kind=OBJ_BOX
        )
        state, ctx, (dx, dy), door_color, _ = rg.add_door(
            k_door, state, ctx, 0, 0, door_idx=0, locked=True
        )
        ball_color = jax.random.randint(k_ballc, (), 0, 6)
        state = G.put_obj(state, dx - 1, dy, OBJ_BALL, ball_color)
        state, ctx, _, _ = rg.place_in_room(
            k_key, state, ctx, room_size, 0, 0, OBJ_KEY, door_color
        )
        state = rg.place_agent(k_agent, state, room_size, i=0, j=0, rows=1, cols=2)
        return state, _pickup_codes(OBJ_BOX, B.COLOR_ANY), jnp.asarray(True)

    return make_level(env_id, gen, room_size, 1, 2, max_steps=16 * room_size**2, instr_profile=B.single_profile("pickup"))


def make_unlock_to_unlock(env_id: str) -> Environment:
    """unlock.py UnlockToUnlock — key B behind door A, ball behind door B."""
    room_size = 6

    def gen(key, p, state, ctx):
        k_colors, k_d1, k_k1, k_d2, k_k2, k_ballc, k_ball, k_agent = (
            jax.random.split(key, 8)
        )
        colors = rand_color_subset(k_colors, 2)
        state, ctx, _, _, _ = rg.add_door(
            k_d1, state, ctx, 0, 0, door_idx=0, color=colors[0], locked=True
        )
        state, ctx, _, _ = rg.place_in_room(
            k_k1, state, ctx, room_size, 2, 0, OBJ_KEY, colors[0]
        )
        state, ctx, _, _, _ = rg.add_door(
            k_d2, state, ctx, 1, 0, door_idx=0, color=colors[1], locked=True
        )
        state, ctx, _, _ = rg.place_in_room(
            k_k2, state, ctx, room_size, 1, 0, OBJ_KEY, colors[1]
        )
        ball_color = jax.random.randint(k_ballc, (), 0, 6)
        state, ctx, _, _ = rg.place_in_room(
            k_ball, state, ctx, room_size, 0, 0, OBJ_BALL, ball_color
        )
        state = rg.place_agent(k_agent, state, room_size, i=1, j=0, rows=1, cols=3)
        return state, _pickup_codes(OBJ_BALL, B.COLOR_ANY), jnp.asarray(True)

    return make_level(env_id, gen, room_size, 1, 3, max_steps=30 * room_size**2, instr_profile=B.single_profile("pickup"))
