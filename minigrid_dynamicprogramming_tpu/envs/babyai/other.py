"""BabyAI 'other' levels (reference /root/reference/minigrid/envs/babyai/other.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_dynamicprogramming_tpu.core.constants import (
    OBJ_BALL,
    OBJ_DOOR,
    OBJ_KEY,
)
from minigrid_dynamicprogramming_tpu.core.env import Environment
from minigrid_dynamicprogramming_tpu.envs.babyai import core as B
from minigrid_dynamicprogramming_tpu.envs.babyai.level import make_level
from minigrid_dynamicprogramming_tpu.ops import roomgrid as rg


def _single(kind, d1):
    return B.instr_codes(B.COMB_SINGLE, B.clause(kind, d1=d1))


def make_action_obj_door(env_id: str) -> Environment:
    """other.py ActionObjDoor — go to / open / pick up one of 5 objects or 4
    doors in the center room."""
    room_size = 7

    def gen(key, p, state, ctx):
        k_dist, k_doors, k_agent, k_pick, k_act = jax.random.split(key, 5)
        state, ctx, kinds, colors, _ = rg.add_distractors(
            k_dist, state, ctx, room_size, 3, 3, 1, 1,
            num_distractors=5, all_unique=True,
        )
        all_kinds = jnp.concatenate([kinds, jnp.full((4,), OBJ_DOOR)])
        all_colors = jnp.concatenate([colors, jnp.zeros((4,), jnp.int32)])
        dk = jax.random.split(k_doors, 4)
        for n in range(4):
            state, ctx, _, c, _ = rg.add_door(
                dk[n], state, ctx, 1, 1, locked=False
            )
            all_colors = all_colors.at[5 + n].set(c)
        state = rg.place_agent(k_agent, state, room_size, i=1, j=1, rows=3, cols=3)
        n = jax.random.randint(k_pick, (), 0, 9)
        kind = all_kinds[n]
        color = all_colors[n]
        coin = jax.random.randint(k_act, (), 0, 2) == 0
        # doors: GoTo or Open; objects: GoTo or Pickup (other.py:33-43).
        instr_kind = jnp.where(
            coin,
            B.KIND_GOTO,
            jnp.where(kind == OBJ_DOOR, B.KIND_OPEN, B.KIND_PICKUP),
        )
        codes = B.instr_codes(
            B.COMB_SINGLE, B.clause(B.KIND_GOTO, d1=(kind, color, 0))
        )
        codes = codes.at[B._leaf_base(0, 0)].set(instr_kind)
        return state, codes, jnp.asarray(True)

    return make_level(env_id, gen, room_size, 3, 3, instr_profile=B.single_profile("goto", "open", "pickup"))


def make_find_obj(env_id: str, room_size: int = 5) -> Environment:
    """other.py FindObjS5 — a single object hidden in a random room."""

    def gen(key, p, state, ctx):
        k_i, k_j, k_obj, k_agent, k_conn = jax.random.split(key, 5)
        # The reference samples i from num_rows and j from num_cols
        # (other.py:160-162); harmless on the square 3x3 grid — mirrored.
        i = jax.random.randint(k_i, (), 0, 3)
        j = jax.random.randint(k_j, (), 0, 3)
        state, ctx, _, kind, color = rg.add_object(
            k_obj, state, ctx, room_size, i, j
        )
        state = rg.place_agent(k_agent, state, room_size, i=1, j=1, rows=3, cols=3)
        state, ctx = rg.connect_all(k_conn, state, ctx, room_size)
        return state, _single(B.KIND_PICKUP, (kind, B.COLOR_ANY, 0)), jnp.asarray(True)

    return make_level(env_id, gen, room_size, 3, 3, max_steps=20 * room_size**2, instr_profile=B.single_profile("pickup"))


def make_key_corridor(
    env_id: str, num_rows: int = 3, room_size: int = 6, obj_type: int = OBJ_BALL
) -> Environment:
    """other.py KeyCorridor — locked right room holds the target; key on the
    left; middle column is a hallway."""

    def gen(key, p, state, ctx):
        k_row, k_door, k_obj, k_keyrow, k_key, k_agent, k_conn = (
            jax.random.split(key, 7)
        )
        for j in range(1, num_rows):
            state, ctx = rg.remove_wall(state, ctx, room_size, 1, j, 3)
        row = jax.random.randint(k_row, (), 0, num_rows)
        state, ctx, _, door_color, _ = rg.add_door(
            k_door, state, ctx, 2, row, door_idx=2, locked=True
        )
        state, ctx, _, kind, color = rg.add_object(
            k_obj, state, ctx, room_size, 2, row, kind=obj_type
        )
        key_row = jax.random.randint(k_keyrow, (), 0, num_rows)
        state, ctx, _, _ = rg.place_in_room(
            k_key, state, ctx, room_size, 0, key_row, OBJ_KEY, door_color
        )
        state = rg.place_agent(
            k_agent, state, room_size, i=1, j=num_rows // 2, rows=num_rows, cols=3
        )
        state, ctx = rg.connect_all(k_conn, state, ctx, room_size)
        return state, _single(B.KIND_PICKUP, (kind, B.COLOR_ANY, 0)), jnp.asarray(True)

    return make_level(env_id, gen, room_size, num_rows, 3, max_steps=30 * room_size**2, instr_profile=B.single_profile("pickup"))


def make_one_room(env_id: str, room_size: int = 8) -> Environment:
    """other.py OneRoomS8 — pick up the ball in a single room."""

    def gen(key, p, state, ctx):
        k_obj, k_agent = jax.random.split(key)
        state, ctx, _, kind, _ = rg.add_object(
            k_obj, state, ctx, room_size, 0, 0, kind=OBJ_BALL
        )
        state = rg.place_agent(k_agent, state, room_size)
        return state, _single(B.KIND_PICKUP, (OBJ_BALL, B.COLOR_ANY, 0)), jnp.asarray(True)

    return make_level(env_id, gen, room_size, 1, 1, instr_profile=B.single_profile("pickup"))


def make_move_two_across(
    env_id: str, room_size: int, objs_per_room: int
) -> Environment:
    """other.py MoveTwoAcross — two PutNext instructions in sequence across
    the two joined rooms."""

    def gen(key, p, state, ctx):
        k_agent, k_l, k_r, k_pl, k_pr = jax.random.split(key, 5)
        state = rg.place_agent(k_agent, state, room_size, i=0, j=0, rows=1, cols=2)
        state, ctx, kl, cl, _ = rg.add_distractors(
            k_l, state, ctx, room_size, 1, 2, 0, 0,
            num_distractors=objs_per_room, all_unique=True,
        )
        state, ctx, kr, cr, _ = rg.add_distractors(
            k_r, state, ctx, room_size, 1, 2, 1, 0,
            num_distractors=objs_per_room, all_unique=True,
        )
        state, ctx = rg.remove_wall(state, ctx, room_size, 0, 0, 0)
        two_l = jax.random.permutation(k_pl, objs_per_room)[:2]
        two_r = jax.random.permutation(k_pr, objs_per_room)[:2]
        a, d = two_l[0], two_l[1]
        b, c = two_r[0], two_r[1]
        codes = B.instr_codes(
            B.COMB_BEFORE,
            B.clause(B.KIND_PUTNEXT, d1=(kl[a], cl[a], 0), d2=(kr[b], cr[b], 0)),
            B.clause(B.KIND_PUTNEXT, d1=(kr[c], cr[c], 0), d2=(kl[d], cl[d], 0)),
        )
        return state, codes, jnp.asarray(True)

    return make_level(env_id, gen, room_size, 1, 2, max_steps=16 * room_size**2, instr_profile=(("before",), ("putnext",), (), ("putnext",), ()))
