"""BabyAI Pickup and PutNext levels (reference
/root/reference/minigrid/envs/babyai/pickup.py, putnext.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_dynamicprogramming_tpu.core.constants import OBJ_EMPTY
from minigrid_dynamicprogramming_tpu.core.env import Environment
from minigrid_dynamicprogramming_tpu.envs.babyai import core as B
from minigrid_dynamicprogramming_tpu.envs.babyai.level import (
    make_level,
    objs_reachable,
)
from minigrid_dynamicprogramming_tpu.ops import grid as G
from minigrid_dynamicprogramming_tpu.ops import roomgrid as rg


def _pickup_codes(kind, color, strict=0):
    return B.instr_codes(
        B.COMB_SINGLE,
        B.clause(B.KIND_PICKUP, strict=strict, d1=(kind, color, B.LOC_NONE)),
    )


def make_pickup(
    env_id: str, room_size: int = 8, num_rows: int = 3, num_cols: int = 3
) -> Environment:
    """pickup.py Pickup — pick up a random distractor in a connected maze."""

    def gen(key, p, state, ctx):
        k_agent, k_conn, k_dist, k_pick = jax.random.split(key, 4)
        state = rg.place_agent(
            k_agent, state, room_size, rows=num_rows, cols=num_cols
        )
        state, ctx = rg.connect_all(k_conn, state, ctx, room_size)
        state, ctx, kinds, colors, _ = rg.add_distractors(
            k_dist, state, ctx, room_size, num_rows, num_cols,
            num_distractors=18, all_unique=False,
        )
        ok = objs_reachable(state)
        n = jax.random.randint(k_pick, (), 0, 18)
        return state, _pickup_codes(kinds[n], colors[n]), ok

    return make_level(env_id, gen, room_size, num_rows, num_cols, instr_profile=B.single_profile("pickup"))


def make_unblock_pickup(
    env_id: str, room_size: int = 8, num_rows: int = 3, num_cols: int = 3
) -> Environment:
    """pickup.py UnblockPickup — at least one object must be unreachable
    without moving another (pickup.py:31-35: reject if all reachable)."""

    def gen(key, p, state, ctx):
        k_agent, k_conn, k_dist, k_pick = jax.random.split(key, 4)
        state = rg.place_agent(
            k_agent, state, room_size, rows=num_rows, cols=num_cols
        )
        state, ctx = rg.connect_all(k_conn, state, ctx, room_size)
        state, ctx, kinds, colors, _ = rg.add_distractors(
            k_dist, state, ctx, room_size, num_rows, num_cols,
            num_distractors=20, all_unique=False,
        )
        ok = ~objs_reachable(state)
        n = jax.random.randint(k_pick, (), 0, 20)
        return state, _pickup_codes(kinds[n], colors[n]), ok

    return make_level(env_id, gen, room_size, num_rows, num_cols, instr_profile=B.single_profile("pickup"))


def make_pickup_dist(env_id: str, debug: bool = False) -> Environment:
    """pickup.py PickupDist — 5 unique objects in a size-7 room; target
    described by type, color, or both."""
    room_size = 7

    def gen(key, p, state, ctx):
        k_dist, k_agent, k_pick, k_by = jax.random.split(key, 4)
        state, ctx, kinds, colors, _ = rg.add_distractors(
            k_dist, state, ctx, room_size, 1, 1, 0, 0,
            num_distractors=5, all_unique=True,
        )
        state = rg.place_agent(k_agent, state, room_size, i=0, j=0)
        n = jax.random.randint(k_pick, (), 0, 5)
        by = jax.random.randint(k_by, (), 0, 3)  # 0 type, 1 color, 2 both
        kind = jnp.where(by == 1, B.TYPE_ANY, kinds[n])
        color = jnp.where(by == 0, B.COLOR_ANY, colors[n])
        return state, _pickup_codes(kind, color, strict=int(debug)), jnp.asarray(True)

    return make_level(env_id, gen, room_size, 1, 1, instr_profile=B.single_profile("pickup"))


def make_pickup_above(env_id: str) -> Environment:
    """pickup.py PickupAbove — object in the room above, direct door."""
    room_size = 6

    def gen(key, p, state, ctx):
        k_obj, k_door, k_agent, k_conn = jax.random.split(key, 4)
        state, ctx, _, kind, color = rg.add_object(
            k_obj, state, ctx, room_size, 1, 0
        )
        state, ctx, _, _, _ = rg.add_door(
            k_door, state, ctx, 1, 1, door_idx=3, locked=False
        )
        state = rg.place_agent(k_agent, state, room_size, i=1, j=1, rows=3, cols=3)
        state, ctx = rg.connect_all(k_conn, state, ctx, room_size)
        return state, _pickup_codes(kind, color), jnp.asarray(True)

    return make_level(env_id, gen, room_size, 3, 3, max_steps=8 * room_size**2, instr_profile=B.single_profile("pickup"))


# -- PutNext ------------------------------------------------------------------


def make_putnext_local(
    env_id: str, room_size: int = 8, num_objs: int = 8
) -> Environment:
    """putnext.py PutNextLocal — move one unique object next to another in a
    single room."""

    def gen(key, p, state, ctx):
        k_agent, k_dist, k_pick = jax.random.split(key, 3)
        state = rg.place_agent(k_agent, state, room_size)
        state, ctx, kinds, colors, _ = rg.add_distractors(
            k_dist, state, ctx, room_size, 1, 1, 0, 0,
            num_distractors=num_objs, all_unique=True,
        )
        ok = objs_reachable(state)
        two = jax.random.permutation(k_pick, num_objs)[:2]
        codes = B.instr_codes(
            B.COMB_SINGLE,
            B.clause(
                B.KIND_PUTNEXT,
                d1=(kinds[two[0]], colors[two[0]], 0),
                d2=(kinds[two[1]], colors[two[1]], 0),
            ),
        )
        # PutNext validation (already-adjacent/intersecting sets) happens
        # generically in make_level's attempt.
        return state, codes, ok

    return make_level(env_id, gen, room_size, 1, 1, instr_profile=B.single_profile("putnext"))


def make_putnext(
    env_id: str,
    room_size: int,
    objs_per_room: int,
    start_carrying: bool = False,
) -> Environment:
    """putnext.py PutNext — two rooms side by side, wall removed; move an
    object from one side next to an object from the other."""

    def gen(key, p, state, ctx):
        k_agent, k_l, k_r, k_a, k_b, k_flip = jax.random.split(key, 6)
        state = rg.place_agent(k_agent, state, room_size, i=0, j=0, rows=1, cols=2)
        state, ctx, kl, cl, pl = rg.add_distractors(
            k_l, state, ctx, room_size, 1, 2, 0, 0,
            num_distractors=objs_per_room, all_unique=True,
        )
        state, ctx, kr, cr, pr = rg.add_distractors(
            k_r, state, ctx, room_size, 1, 2, 1, 0,
            num_distractors=objs_per_room, all_unique=True,
        )
        state, ctx = rg.remove_wall(state, ctx, room_size, 0, 0, 0)
        na = jax.random.randint(k_a, (), 0, objs_per_room)
        nb = jax.random.randint(k_b, (), 0, objs_per_room)
        flip = jax.random.randint(k_flip, (), 0, 2) == 0
        ka = jnp.where(flip, kr[nb], kl[na])
        ca = jnp.where(flip, cr[nb], cl[na])
        pa = jnp.where(flip, pr[nb], pl[na])
        kb = jnp.where(flip, kl[na], kr[nb])
        cb = jnp.where(flip, cl[na], cr[nb])
        codes = B.instr_codes(
            B.COMB_SINGLE,
            B.clause(B.KIND_PUTNEXT, d1=(ka, ca, 0), d2=(kb, cb, 0)),
        )
        if start_carrying:
            # PutNext.reset (putnext.py:192-201): the agent starts carrying
            # obj_a; the cell is cleared AFTER the verifier resolved its
            # sets, so vmarks keep the stale original position.
            state = state.replace(aux=state.aux.at[10].set(pa[0]).at[11].set(pa[1]))
        return state, codes, jnp.asarray(True)

    env = make_level(
        env_id, gen, room_size, 1, 2, max_steps=8 * room_size**2,
        instr_profile=B.single_profile("putnext"),
    )
    if start_carrying:
        inner_gen = env.generate

        def generate(key, p):
            state = inner_gen(key, p)
            x = state.aux[10]
            y = state.aux[11]
            kind = state.grid_obj[y, x]
            color = state.grid_color[y, x]
            mk = state.marks[y, x]
            return state.replace(
                grid_obj=G.cell_set(state.grid_obj, y, x, OBJ_EMPTY),
                grid_color=G.cell_set(state.grid_color, y, x, 0),
                marks=G.cell_set(state.marks, y, x, 0),
                carrying_obj=kind,
                carrying_color=color,
                carrying_marks=mk,
            )

        env.generate = generate
    return env
