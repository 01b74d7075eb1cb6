"""Generic BabyAI level sampler (reference
/root/reference/minigrid/envs/babyai/core/levelgen.py).

``LevelGen.gen_mission`` composes an optional locked room, full maze
connection, distractors, agent placement and a *random instruction* drawn
from the grammar ``{action, and, seq} x {goto, pickup, open, putnext}``.
Here every rejection loop becomes a bounded masked redraw:

* ``add_locked_room``'s retry loops -> categorical draws over validity masks
  (levelgen.py:85-112);
* ``rand_obj``'s match-at-least-one retry (levelgen.py:114-155) -> a
  per-descriptor ``while_loop`` redrawing (color, type, loc) until the
  descriptor matches an object (plus the implicit-unlock filter);
* instruction-shape sampling (levelgen.py:157-210) -> traced code-vector
  assembly (the instr/action kind lists are static per env id).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

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
from minigrid_dynamicprogramming_tpu.ops import roomgrid as rg

OBJ_TYPES = (OBJ_BOX, OBJ_BALL, OBJ_KEY, OBJ_DOOR)  # verifier.py:15
OBJ_TYPES_NOT_DOOR = (OBJ_BOX, OBJ_BALL, OBJ_KEY)

ACTION_IDS = {"goto": B.KIND_GOTO, "pickup": B.KIND_PICKUP,
              "open": B.KIND_OPEN, "putnext": B.KIND_PUTNEXT}


def _locked_room_mask(params, li, lj):
    """(H, W) bool for the locked room's interior (Room.pos_inside)."""
    rs = params.opt("room_size", 8)
    tx, ty = li * (rs - 1), lj * (rs - 1)
    ys = jnp.arange(params.height)[:, None]
    xs = jnp.arange(params.width)[None, :]
    return (xs >= tx) & (xs < tx + rs) & (ys >= ty) & (ys < ty + rs)


def _rand_obj(key, params, state, kind, has_locked, li, lj,
              locations: bool, implicit_unlock: bool, max_tries: int = 100):
    """One ObjDesc draw with rejection (levelgen.py:114-155).  Returns
    (type, color, loc, ok)."""

    def draw(k):
        kc, kt, kt2, kl1, kl2 = jax.random.split(k, 5)
        # color: uniform over [None] + 6 colors (levelgen.py:127).
        ci = jax.random.randint(kc, (), 0, 7)
        color = jnp.where(ci == 0, B.COLOR_ANY, ci - 1)
        # type per leaf kind (levelgen.py:167-176).
        t_any = jnp.asarray(OBJ_TYPES)[jax.random.randint(kt, (), 0, 4)]
        t_nd = jnp.asarray(OBJ_TYPES_NOT_DOOR)[jax.random.randint(kt2, (), 0, 3)]
        # pickup and putnext's move descriptor exclude doors
        # (levelgen.py:169-176).
        dtype = jnp.where(
            kind == B.KIND_OPEN,
            OBJ_DOOR,
            jnp.where(
                (kind == B.KIND_PICKUP) | (kind == B.KIND_PUTNEXT), t_nd, t_any
            ),
        )
        if locations:
            use_loc = jax.random.randint(kl1, (), 0, 2) == 0
            loc = jnp.where(use_loc, jax.random.randint(kl2, (), 1, 5), 0)
        else:
            loc = jnp.asarray(0)
        return dtype, color, loc

    def valid(dtype, color, loc):
        m = B.desc_match_mask(params, state, dtype, color, loc)
        ok = jnp.any(m)
        if not implicit_unlock:
            # At least one match outside the locked room (levelgen.py:143-152).
            outside = m & ~_locked_room_mask(params, li, lj)
            ok &= jnp.any(outside) | ~has_locked
        return ok

    def cond(c):
        _, _, _, ok, it, _ = c
        return (~ok) & (it < max_tries)

    def body(c):
        _, _, _, _, it, k = c
        k, kd = jax.random.split(k)
        t, col, loc = draw(kd)
        return t, col, loc, valid(t, col, loc), it + 1, k

    k0, kl = jax.random.split(key)
    t, col, loc = draw(k0)
    t, col, loc, ok, _, _ = jax.lax.while_loop(
        cond, body, (t, col, loc, valid(t, col, loc), jnp.asarray(0), kl)
    )
    return t, col, loc, ok


def make_levelgen(
    env_id: str,
    room_size: int = 8,
    num_rows: int = 3,
    num_cols: int = 3,
    num_dists: int = 18,
    locked_room_prob: float = 0.5,
    locations: bool = True,
    unblocking: bool = True,
    implicit_unlock: bool = True,
    action_kinds: Sequence[str] = ("goto", "pickup", "open", "putnext"),
    instr_kinds: Sequence[str] = ("action", "and", "seq"),
) -> Environment:
    action_ids = jnp.asarray([ACTION_IDS[a] for a in action_kinds])

    def sample_leaf(key, params, state, active, has_locked, li, lj):
        """Random leaf: kind + 1-2 descriptors.  Returns (leaf codes slice
        values..., ok)."""
        ka, k1, k2 = jax.random.split(key, 3)
        kind = action_ids[jax.random.randint(ka, (), 0, len(action_kinds))]
        t1, c1, l1, ok1 = _rand_obj(
            k1, params, state, kind, has_locked, li, lj,
            locations, implicit_unlock,
        )
        # putnext's second descriptor draws over all types (levelgen.py:173-176).
        t2, c2, l2, ok2 = _rand_obj(
            k2, params, state, B.KIND_GOTO, has_locked, li, lj,
            locations, implicit_unlock,
        )
        is_put = kind == B.KIND_PUTNEXT
        ok = ok1 & (ok2 | ~is_put)
        leaf = jnp.stack([
            kind, jnp.asarray(0),
            t1, c1, l1, jnp.asarray(0),
            jnp.where(is_put, t2, 0),
            jnp.where(is_put, c2, B.COLOR_ANY),
            jnp.where(is_put, l2, 0),
            jnp.asarray(0),
        ]).astype(jnp.int32)
        leaf = jnp.where(active, leaf, jnp.zeros_like(leaf))
        return leaf, ok | ~active

    def gen(key, p, state, ctx):
        (k_lock, k_lockroom, k_lockedge, k_keyroom, k_key, k_conn, k_dist,
         k_agent, k_instr) = jax.random.split(key, 9)

        # Optional locked room (levelgen.py:59-60, :85-112).
        has_locked = jax.random.uniform(k_lock) < locked_room_prob
        flat = jnp.arange(num_rows * num_cols * 4)
        ei = (flat // 4) % num_cols
        ej = flat // (4 * num_cols)
        ek = flat % 4
        valid_edges = ctx.has_edge.reshape(-1)[
            (ej * num_cols + ei) * 4 + ek
        ]
        pick = jax.random.categorical(
            k_lockedge, jnp.where(valid_edges, 0.0, -jnp.inf)
        )
        li, lj, lk = ei[pick], ej[pick], ek[pick]
        sub, sub_ctx, _, door_color, _ = rg.add_door(
            k_lockroom, state, ctx, li, lj, door_idx=lk, locked=True
        )
        rooms = jnp.arange(num_rows * num_cols)
        ri = rooms % num_cols
        rj = rooms // num_cols
        kpick = jax.random.categorical(
            k_keyroom, jnp.where(~((ri == li) & (rj == lj)), 0.0, -jnp.inf)
        )
        sub, sub_ctx, _, _ = rg.place_in_room(
            k_key, sub, sub_ctx, room_size, ri[kpick], rj[kpick],
            OBJ_KEY, door_color,
        )
        state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(has_locked, a, b), sub, state
        )
        ctx = jax.tree_util.tree_map(
            lambda a, b: jnp.where(has_locked, a, b), sub_ctx, ctx
        )

        state, ctx = rg.connect_all(k_conn, state, ctx, room_size)
        state, ctx, _, _, _ = rg.add_distractors(
            k_dist, state, ctx, room_size, num_rows, num_cols,
            num_distractors=num_dists, all_unique=False,
        )

        # Agent not in the locked room (levelgen.py:66-73).
        k_aroom, k_aplace = jax.random.split(k_agent)
        avalid = ~(((ri == li) & (rj == lj)) & has_locked)
        apick = jax.random.categorical(
            k_aroom, jnp.where(avalid, 0.0, -jnp.inf)
        )
        state = rg.place_agent(
            k_aplace, state, room_size, i=ri[apick], j=rj[apick],
            rows=num_rows, cols=num_cols,
        )
        ok = jnp.asarray(True)
        if not unblocking:
            ok &= objs_reachable(state)

        # Random instruction (levelgen.py:157-210).
        k_kind, k_seq, k_sub, k_leaves = jax.random.split(k_instr, 4)
        top = jax.random.randint(k_kind, (), 0, len(instr_kinds))
        top_kind = jnp.asarray(
            [("action", "and", "seq").index(k) for k in instr_kinds]
        )[top]  # 0 action, 1 and, 2 seq
        before = jax.random.randint(k_seq, (), 0, 2) == 0
        # seq sub-clauses each drawn from {action, and} (levelgen.py:189-199).
        sub_and = jax.random.randint(k_sub, (), 0, 2, dtype=jnp.int32)
        sub_and_b = jax.random.randint(
            jax.random.fold_in(k_sub, 1), (), 0, 2, dtype=jnp.int32
        )

        comb = jnp.where(
            top_kind == 2, jnp.where(before, B.COMB_BEFORE, B.COMB_AFTER),
            B.COMB_SINGLE,
        )
        a_is_and = jnp.where(
            top_kind == 1, 1, jnp.where(top_kind == 2, sub_and, 0)
        )
        b_active = top_kind == 2
        b_is_and = jnp.where(b_active, sub_and_b, 0)

        lk0, lk1, lk2, lk3 = jax.random.split(k_leaves, 4)
        leaf_a0, ok0 = sample_leaf(
            lk0, p, state, jnp.asarray(True), has_locked, li, lj
        )
        leaf_a1, ok1 = sample_leaf(
            lk1, p, state, a_is_and == 1, has_locked, li, lj
        )
        leaf_b0, ok2 = sample_leaf(lk2, p, state, b_active, has_locked, li, lj)
        leaf_b1, ok3 = sample_leaf(
            lk3, p, state, b_active & (b_is_and == 1), has_locked, li, lj
        )
        ok &= ok0 & ok1 & ok2 & ok3

        codes = jnp.concatenate([
            jnp.stack([comb, jnp.asarray(0)]),
            a_is_and[None], leaf_a0, jnp.zeros(1, jnp.int32), leaf_a1,
            jnp.zeros(1, jnp.int32),
            b_is_and[None], leaf_b0, jnp.zeros(1, jnp.int32), leaf_b1,
            jnp.zeros(1, jnp.int32),
        ]).astype(jnp.int32)

        # validate_instrs for unblocking levels (roomgrid_level.py:178-191):
        # no leaf may describe a key matching a locked door's color.
        if unblocking:
            is_door_locked = (state.grid_obj == OBJ_DOOR) & (
                state.grid_state == 2
            )
            for c in range(2):
                for l in range(2):
                    for d in range(2):
                        t, col, _ = B.desc_fields(codes, c, l, d)
                        active = B.desc_active(codes, c, l, d)
                        locked_same = jnp.any(
                            is_door_locked
                            & (state.grid_color == col.astype(jnp.uint8))
                        )
                        bad = (t == OBJ_KEY) & locked_same & active
                        ok &= ~bad
        return state, codes, ok

    # Static instruction shape from the sampler config (levelgen.py:157-210):
    # "and" fills the clause's second leaf; "seq" activates clause B (whose
    # sub-clauses may themselves be and-pairs).
    may_and = ("and" in instr_kinds) or ("seq" in instr_kinds)
    may_seq = "seq" in instr_kinds
    combs = (("single",) if ("action" in instr_kinds or "and" in instr_kinds)
             else ()) + (("before", "after") if may_seq else ())
    main = tuple(action_kinds)
    second = main if may_and else ()
    profile = (
        combs,
        main,
        second,
        main if may_seq else (),
        second if may_seq else (),
    )
    return make_level(
        env_id, gen, room_size, num_rows, num_cols, max_tries=32,
        instr_profile=profile,
    )
