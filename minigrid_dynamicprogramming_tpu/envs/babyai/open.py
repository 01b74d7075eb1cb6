"""BabyAI Open levels (reference /root/reference/minigrid/envs/babyai/open.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_dynamicprogramming_tpu.core.constants import OBJ_DOOR
from minigrid_dynamicprogramming_tpu.core.env import Environment
from minigrid_dynamicprogramming_tpu.envs.babyai import core as B
from minigrid_dynamicprogramming_tpu.envs.babyai.level import (
    make_level,
    objs_reachable,
)
from minigrid_dynamicprogramming_tpu.ops import roomgrid as rg

COLOR_RED = 0


def _open_codes(color, strict=0, loc=B.LOC_NONE):
    return B.instr_codes(
        B.COMB_SINGLE,
        B.clause(B.KIND_OPEN, strict=strict, d1=(OBJ_DOOR, color, loc)),
    )


def rand_color_subset(key, n):
    """_rand_subset(COLOR_NAMES, n) (minigrid_env.py:276-293): an ordered
    uniform subset = the first n of a uniform permutation."""
    return jax.random.permutation(key, 6)[:n].astype(jnp.int32)


def _pick_door_edge(key, ctx):
    """Uniform pick over (room, slot) door entries — interior doors appear in
    both adjacent rooms' lists, doubling their weight exactly like the
    reference's doors list (open.py:39-47)."""
    has_door = (ctx.edge == rg.EDGE_DOOR).reshape(-1)
    idx = jax.random.categorical(key, jnp.where(has_door, 0.0, -jnp.inf))
    x = ctx.door_x.reshape(-1)[idx]
    y = ctx.door_y.reshape(-1)[idx]
    return x, y


def make_open(
    env_id: str, room_size: int = 8, num_rows: int = 3, num_cols: int = 3
) -> Environment:
    """open.py Open — open a random door in a connected maze."""

    def gen(key, p, state, ctx):
        k_agent, k_conn, k_dist, k_pick = jax.random.split(key, 4)
        state = rg.place_agent(
            k_agent, state, room_size, rows=num_rows, cols=num_cols
        )
        state, ctx = rg.connect_all(k_conn, state, ctx, room_size)
        state, ctx, _, _, _ = rg.add_distractors(
            k_dist, state, ctx, room_size, num_rows, num_cols,
            num_distractors=18, all_unique=False,
        )
        ok = objs_reachable(state)
        x, y = _pick_door_edge(k_pick, ctx)
        color = state.grid_color[y, x].astype(jnp.int32)
        return state, _open_codes(color), ok

    return make_level(env_id, gen, room_size, num_rows, num_cols, instr_profile=B.single_profile("open"))


def make_open_red_door(env_id: str) -> Environment:
    """open.py OpenRedDoor — 1x2 rooms of size 5, red door on the shared
    wall."""
    room_size = 5

    def gen(key, p, state, ctx):
        k_door, k_agent = jax.random.split(key)
        state, ctx, _, _, _ = rg.add_door(
            k_door, state, ctx, 0, 0, door_idx=0, color=COLOR_RED, locked=False
        )
        state = rg.place_agent(k_agent, state, room_size, i=0, j=0, rows=1, cols=2)
        return state, _open_codes(COLOR_RED), jnp.asarray(True)

    return make_level(env_id, gen, room_size, 1, 2, instr_profile=B.single_profile("open"))


def make_open_door(
    env_id: str, debug: bool = False, select_by=None
) -> Environment:
    """open.py OpenDoor — 4 distinctly-colored doors on the center room;
    select the target by color or by location."""
    room_size = 8

    def gen(key, p, state, ctx):
        k_colors, k_doors, k_sel, k_loc, k_agent = jax.random.split(key, 5)
        colors = rand_color_subset(k_colors, 4)
        dk = jax.random.split(k_doors, 4)
        for i in range(4):
            state, ctx, _, _, _ = rg.add_door(
                dk[i], state, ctx, 1, 1, door_idx=i, color=colors[i], locked=False
            )
        if select_by is None:
            by_color = jax.random.randint(k_sel, (), 0, 2) == 0
        else:
            by_color = jnp.asarray(select_by == "color")
        loc = jax.random.randint(k_loc, (), 1, 5)  # LOC_LEFT..LOC_BEHIND
        state = rg.place_agent(k_agent, state, room_size, i=1, j=1, rows=3, cols=3)
        codes = jnp.where(
            by_color,
            _open_codes(colors[0], strict=int(debug)),
            _open_codes(B.COLOR_ANY, strict=int(debug), loc=loc),
        )
        return state, codes, jnp.asarray(True)

    return make_level(env_id, gen, room_size, 3, 3, instr_profile=B.single_profile("open"))


def make_open_two_doors(
    env_id: str,
    first_color=None,
    second_color=None,
    strict: bool = False,
) -> Environment:
    """open.py OpenTwoDoors — open the left door, then the right door."""
    room_size = 6
    _CIDX = {"red": 0, "green": 1, "blue": 2, "purple": 3, "yellow": 4, "grey": 5}

    def gen(key, p, state, ctx):
        k_colors, k_d1, k_d2, k_agent = jax.random.split(key, 4)
        colors = rand_color_subset(k_colors, 2)
        c1 = jnp.asarray(_CIDX[first_color]) if first_color else colors[0]
        c2 = jnp.asarray(_CIDX[second_color]) if second_color else colors[1]
        state, ctx, _, _, _ = rg.add_door(
            k_d1, state, ctx, 1, 1, door_idx=2, color=c1, locked=False
        )
        state, ctx, _, _, _ = rg.add_door(
            k_d2, state, ctx, 1, 1, door_idx=0, color=c2, locked=False
        )
        state = rg.place_agent(k_agent, state, room_size, i=1, j=1, rows=3, cols=3)
        codes = B.instr_codes(
            B.COMB_BEFORE,
            B.clause(B.KIND_OPEN, strict=int(strict), d1=(OBJ_DOOR, c1, 0)),
            B.clause(B.KIND_OPEN, d1=(OBJ_DOOR, c2, 0)),
        )
        return state, codes, jnp.asarray(True)

    return make_level(env_id, gen, room_size, 3, 3, max_steps=20 * room_size**2, instr_profile=(("before",), ("open",), (), ("open",), ()))


def make_open_doors_order(
    env_id: str, num_doors: int, debug: bool = False
) -> Environment:
    """open.py OpenDoorsOrder — open one door, or two in a given order."""
    room_size = 6

    def gen(key, p, state, ctx):
        k_colors, k_doors, k_pick, k_mode, k_agent = jax.random.split(key, 5)
        colors = rand_color_subset(k_colors, num_doors)
        dk = jax.random.split(k_doors, num_doors)
        for i in range(num_doors):
            state, ctx, _, _, _ = rg.add_door(
                dk[i], state, ctx, 1, 1, color=colors[i], locked=False
            )
        state = rg.place_agent(k_agent, state, room_size, i=1, j=1, rows=3, cols=3)
        two = jax.random.permutation(k_pick, num_doors)[:2]
        c1 = colors[two[0]]
        c2 = colors[two[1]]
        mode = jax.random.randint(k_mode, (), 0, 3)
        s = int(debug)
        single = B.instr_codes(
            B.COMB_SINGLE, B.clause(B.KIND_OPEN, strict=s, d1=(OBJ_DOOR, c1, 0))
        )
        before = B.instr_codes(
            B.COMB_BEFORE,
            B.clause(B.KIND_OPEN, strict=s, d1=(OBJ_DOOR, c1, 0)),
            B.clause(B.KIND_OPEN, strict=s, d1=(OBJ_DOOR, c2, 0)),
        )
        after = B.instr_codes(
            B.COMB_AFTER,
            B.clause(B.KIND_OPEN, strict=s, d1=(OBJ_DOOR, c1, 0)),
            B.clause(B.KIND_OPEN, strict=s, d1=(OBJ_DOOR, c2, 0)),
        )
        codes = jnp.where(mode == 0, single, jnp.where(mode == 1, before, after))
        return state, codes, jnp.asarray(True)

    return make_level(env_id, gen, room_size, 3, 3, max_steps=20 * room_size**2, instr_profile=(("single", "before", "after"), ("open",), (), ("open",), ()))
