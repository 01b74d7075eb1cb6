"""BabyAI language core: flattened instructions + device-side verifier.

TPU-native re-derivation of the reference BabyAI stack
(/root/reference/minigrid/envs/babyai/core/verifier.py,
roomgrid_level.py).  The reference builds a tree of ``Instr`` objects whose
``verify(action)`` walks Python object identity sets each step; here the
instruction is a flat 24-int code vector stored in ``state.mission`` and the
per-step verification is one branchless kernel fused into ``post_step``.

Object identity (``ObjDesc.obj_set``, verifier.py:104-169) becomes *bit
planes*: descriptor slot k owns bit k of ``state.marks`` — set on the cells
of matching objects at reset and carried along through pickup/drop by the
base transition kernel.  ``state.vmarks`` is the verifier's *position
snapshot* (``obj_poss``), refreshed from ``marks`` only on reset and on drop
actions, exactly reproducing the reference's stale-position semantics
(roomgrid_level.py:89-91: ``update_objs_poss`` runs only when the action is
``drop``).

Mission code layout (state.mission, MISSION_SLOTS = 24 ints)::

    [0]  comb        0 = single, 1 = before, 2 = after, 3 = and
    [1]  comb_strict
    [2:12]  clause A: kind, strict, d1_type, d1_color, d1_loc, d1_plural,
                      d2_type, d2_color, d2_loc, d2_plural
    [12:22] clause B: same layout
    kind: 0 none, 1 goto, 2 open, 3 pickup, 4 putnext
    type: object-type index (4 door, 5 key, 6 ball, 7 box), 0 = any
    color: 0..5, 6 = any;  loc: 0 none, 1 left, 2 right, 3 front, 4 behind

Descriptor mark bits: A.d1 = bit 0, A.d2 = bit 1, B.d1 = bit 2, B.d2 = bit 3.
Bits 4/5 track each clause's ``preCarrying`` object (the remembered carried
object of Pickup/PutNext verifiers, verifier.py:336-359, :385-433).

Verifier aux slots (state.aux): A_DONE, B_DONE in {0 cont, 1 success,
2 failure}; PC_NONE_{A,B} (1 = remembered carrying was None); MAX_STEPS (the
per-episode step limit, roomgrid_level.py:76-83).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from minigrid_dynamicprogramming_tpu.core.constants import (
    ACT_DONE,
    ACT_DROP,
    ACT_PICKUP,
    ACT_TOGGLE,
    DIR_TO_VEC_ARR,
    OBJ_DOOR,
    OBJ_EMPTY,
    STATE_OPEN,
)
from minigrid_dynamicprogramming_tpu.core.state import EnvParams, EnvState
from minigrid_dynamicprogramming_tpu.ops.step import success_reward

# -- instruction encodings ---------------------------------------------------

COMB_SINGLE, COMB_BEFORE, COMB_AFTER, COMB_AND = 0, 1, 2, 3
KIND_NONE, KIND_GOTO, KIND_OPEN, KIND_PICKUP, KIND_PUTNEXT = 0, 1, 2, 3, 4
LOC_NONE, LOC_LEFT, LOC_RIGHT, LOC_FRONT, LOC_BEHIND = 0, 1, 2, 3, 4
COLOR_ANY = 6
TYPE_ANY = 0

# verifier aux slots (upper range; env generators use the lower slots)
AUX_A_DONE = 16
AUX_B_DONE = 17
AUX_PC_NONE_A = 18
AUX_PC_NONE_B = 19
AUX_MAX_STEPS = 20

BIT_A1, BIT_A2, BIT_B1, BIT_B2 = 1, 2, 4, 8
BIT_REMEMBER_A, BIT_REMEMBER_B = 16, 32

OBJ_TYPE_NAMES = {4: "door", 5: "key", 6: "ball", 7: "box"}
COLOR_NAMES6 = ["red", "green", "blue", "purple", "yellow", "grey"]
LOC_SUFFIX = {
    LOC_LEFT: " on your left",
    LOC_RIGHT: " on your right",
    LOC_FRONT: " in front of you",
    LOC_BEHIND: " behind you",
}


def clause(kind, strict=0, d1=(0, COLOR_ANY, 0), d2=(0, COLOR_ANY, 0)):
    """Build a 10-int clause code (plural flags filled by init_instr)."""
    return [kind, strict, d1[0], d1[1], d1[2], 0, d2[0], d2[1], d2[2], 0]


def instr_codes(comb, clause_a, clause_b=None, strict=0):
    """Full 24-int mission code vector (plural flags zero until init)."""
    b = clause_b if clause_b is not None else clause(KIND_NONE)
    return jnp.asarray([comb, strict] + list(clause_a) + list(b), dtype=jnp.int32)


# -- descriptor matching (ObjDesc.find_matching_objs, verifier.py:104-169) ---


def room_inside_mask(params: EnvParams, pos) -> jnp.ndarray:
    """(H, W) bool — cells inside the room containing ``pos``
    (RoomGrid.room_from_pos + Room.pos_inside, roomgrid.py:43-49,:110-121)."""
    rs = params.opt("room_size", 8)
    x, y = pos[0], pos[1]
    ri = x // (rs - 1)
    rj = y // (rs - 1)
    top_x, top_y = ri * (rs - 1), rj * (rs - 1)
    ys = jnp.arange(params.height)[:, None]
    xs = jnp.arange(params.width)[None, :]
    return (xs >= top_x) & (xs < top_x + rs) & (ys >= top_y) & (ys < top_y + rs)


def desc_match_mask(
    params: EnvParams, state: EnvState, dtype, dcolor, dloc
) -> jnp.ndarray:
    """(H, W) bool — cells whose object matches (type, color, loc), with loc
    evaluated relative to the agent's current pos/dir and restricted to the
    agent's room (verifier.py:141-163)."""
    obj = state.grid_obj
    m = obj != OBJ_EMPTY  # type None matches any object (verifier.py:133)
    m &= (dtype == TYPE_ANY) | (obj == dtype.astype(jnp.uint8))
    m &= (dcolor == COLOR_ANY) | (state.grid_color == dcolor.astype(jnp.uint8))

    h, w = obj.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    vx = xs - state.agent_pos[0]
    vy = ys - state.agent_pos[1]
    d1 = DIR_TO_VEC_ARR[state.agent_dir]
    d2x, d2y = -d1[1], d1[0]
    dot1 = vx * d1[0] + vy * d1[1]
    dot2 = vx * d2x + vy * d2y
    loc_ok = jnp.where(
        dloc == LOC_LEFT,
        dot2 < 0,
        jnp.where(
            dloc == LOC_RIGHT,
            dot2 > 0,
            jnp.where(
                dloc == LOC_FRONT,
                dot1 > 0,
                jnp.where(dloc == LOC_BEHIND, dot1 < 0, True),
            ),
        ),
    )
    in_room = room_inside_mask(params, state.agent_pos)
    m &= jnp.where(dloc == LOC_NONE, True, loc_ok & in_room)
    return m


def _desc_fields(codes, slot):
    """codes: (24,) — desc slot in {0: A.d1, 1: A.d2, 2: B.d1, 3: B.d2}."""
    base = 2 + (slot // 2) * 10 + 2 + (slot % 2) * 4
    return codes[base], codes[base + 1], codes[base + 2]


def _clause_fields(codes, which):
    base = 2 + which * 10
    return codes[base], codes[base + 1]  # kind, strict


def num_navs(codes) -> jnp.ndarray:
    """roomgrid_level.py:215-235: putnext counts 2, other actions 1,
    combinators sum."""

    def clause_navs(which):
        kind, _ = _clause_fields(codes, which)
        return jnp.where(
            kind == KIND_NONE, 0, jnp.where(kind == KIND_PUTNEXT, 2, 1)
        )

    return clause_navs(0) + clause_navs(1)


def init_instr(params: EnvParams, state: EnvState, codes) -> EnvState:
    """Resolve descriptors into mark bits, set mission codes + plural flags,
    initialize verifier aux state and the per-episode step limit."""
    codes = jnp.asarray(codes, dtype=jnp.int32)
    marks = jnp.zeros_like(state.marks)
    plurals = []
    for slot, bit in enumerate((BIT_A1, BIT_A2, BIT_B1, BIT_B2)):
        dtype, dcolor, dloc = _desc_fields(codes, slot)
        which = slot // 2
        kind, _ = _clause_fields(codes, which)
        active = (kind != KIND_NONE) & ((slot % 2 == 0) | (kind == KIND_PUTNEXT))
        m = desc_match_mask(params, state, dtype, dcolor, dloc) & active
        marks = marks | jnp.where(m, jnp.uint8(bit), jnp.uint8(0))
        plurals.append(jnp.sum(m) > 1)

    # plural flags land in mission slots d*_plural (offsets 5 / 9 per clause)
    for slot, plural in enumerate(plurals):
        idx = 2 + (slot // 2) * 10 + 5 + (slot % 2) * 4
        codes = codes.at[idx].set(plural.astype(jnp.int32))

    rs = params.opt("room_size", 8)
    nav_time_maze = rs * rs * params.opt("num_rows", 3) * params.opt("num_cols", 3)
    max_steps = jnp.where(
        params.opt("fixed_max_steps", False),
        params.max_steps,
        num_navs(codes) * nav_time_maze,
    )

    aux = state.aux
    aux = aux.at[AUX_A_DONE].set(0).at[AUX_B_DONE].set(0)
    aux = aux.at[AUX_PC_NONE_A].set(1).at[AUX_PC_NONE_B].set(1)
    aux = aux.at[AUX_MAX_STEPS].set(max_steps.astype(jnp.int32))
    return state.replace(
        marks=marks, vmarks=marks, carrying_marks=jnp.uint8(0),
        mission=codes, aux=aux,
    )


# -- per-step verification (the post_step hook) ------------------------------


def _bit(x, bit):
    return (x.astype(jnp.int32) & bit) > 0


def _leaf_eval(params, prev, new, action, codes, which, pc_none):
    """Evaluate one clause (without committing state): returns
    (result in {0 cont, 1 succ, 2 fail}, new_pc_none, marks', carrying_marks')
    — marks'/carrying_marks' carry the updated remembered-object bit."""
    kind, strict = _clause_fields(codes, which)
    bit1 = jnp.where(which == 0, BIT_A1, BIT_B1)
    bit2 = jnp.where(which == 0, BIT_A2, BIT_B2)
    rbit = jnp.where(which == 0, BIT_REMEMBER_A, BIT_REMEMBER_B)

    h, w = new.grid_obj.shape
    fwd = new.agent_pos + DIR_TO_VEC_ARR[new.agent_dir]
    fin = (fwd[0] >= 0) & (fwd[0] < w) & (fwd[1] >= 0) & (fwd[1] < h)
    fx = jnp.clip(fwd[0], 0, w - 1)
    fy = jnp.clip(fwd[1], 0, h - 1)
    f_obj = new.grid_obj[fy, fx]
    f_state = new.grid_state[fy, fx]
    f_marks = new.marks[fy, fx]
    f_vmarks = new.vmarks[fy, fx]

    is_toggle = action == ACT_TOGGLE
    is_pickup = action == ACT_PICKUP
    is_drop = action == ACT_DROP
    carrying_now = new.carrying_obj != OBJ_EMPTY

    # GoTo (verifier.py:307-314): agent faces a tracked position.
    goto_succ = fin & _bit(f_vmarks, bit1)

    # Open (verifier.py:268-285).
    f_is_door = fin & (f_obj == OBJ_DOOR)
    open_succ = is_toggle & f_is_door & _bit(f_marks, bit1) & (f_state == STATE_OPEN)
    open_fail = (strict == 1) & is_toggle & f_is_door & ~open_succ

    # Pickup (verifier.py:341-361).
    pick_succ = is_pickup & (pc_none == 1) & _bit(new.carrying_marks, bit1)
    pick_fail = (strict == 1) & is_pickup & carrying_now & ~pick_succ

    # PutNext (verifier.py:409-433): the remembered object must be a tracked
    # mover now lying on the grid with a tracked fixed object 4-adjacent.
    rem_move = _bit(new.marks, rbit) & _bit(new.marks, bit1)  # (H, W)
    fixed = _bit(new.vmarks, bit2)
    up = jnp.pad(fixed[1:], ((0, 1), (0, 0)))
    down = jnp.pad(fixed[:-1], ((1, 0), (0, 0)))
    left = jnp.pad(fixed[:, 1:], ((0, 0), (0, 1)))
    right = jnp.pad(fixed[:, :-1], ((0, 0), (1, 0)))
    next_to_fixed = up | down | left | right
    put_succ = is_drop & jnp.any(rem_move & next_to_fixed)
    put_fail = (strict == 1) & is_pickup & carrying_now

    succ = jnp.where(
        kind == KIND_GOTO,
        goto_succ,
        jnp.where(
            kind == KIND_OPEN,
            open_succ,
            jnp.where(
                kind == KIND_PICKUP,
                pick_succ,
                jnp.where(kind == KIND_PUTNEXT, put_succ, False),
            ),
        ),
    )
    fail = ~succ & jnp.where(
        kind == KIND_OPEN,
        open_fail,
        jnp.where(
            kind == KIND_PICKUP,
            pick_fail,
            jnp.where(kind == KIND_PUTNEXT, put_fail, False),
        ),
    )
    res = jnp.where(succ, 1, jnp.where(fail, 2, 0))

    # State updates on evaluation: remember the current carrying
    # (preCarrying <- env.carrying, verifier.py:343-344).
    tracks_carry = (kind == KIND_PICKUP) | (kind == KIND_PUTNEXT)
    new_pc_none = jnp.where(tracks_carry, (~carrying_now).astype(jnp.int32), pc_none)
    rbit8 = jnp.uint8(rbit)
    marks_clear = new.marks & ~rbit8
    cm_clear = new.carrying_marks & ~rbit8
    cm_set = jnp.where(carrying_now, cm_clear | rbit8, cm_clear)
    marks_upd = jnp.where(tracks_carry, marks_clear, new.marks)
    cm_upd = jnp.where(tracks_carry, cm_set, new.carrying_marks)
    return res, new_pc_none, marks_upd, cm_upd


def verify_step(
    params: EnvParams,
    key,
    prev: EnvState,
    new: EnvState,
    action,
    reward,
    terminated,
):
    """RoomGridLevel.step's verifier pass (roomgrid_level.py:86-103), fully
    branchless over the instruction codes."""
    action = jnp.asarray(action, dtype=jnp.int32)
    codes = new.mission
    comb = codes[0]
    comb_strict = codes[1]
    aux = new.aux
    a_done = aux[AUX_A_DONE]
    b_done = aux[AUX_B_DONE]

    # update_objs_poss on drop actions (roomgrid_level.py:89-91).
    new = new.replace(
        vmarks=jnp.where(action == ACT_DROP, new.marks, new.vmarks)
    )

    res_a, pc_a, marks_a, cm_a = _leaf_eval(
        params, prev, new, action, codes, 0, aux[AUX_PC_NONE_A]
    )
    res_b, pc_b, marks_b, cm_b = _leaf_eval(
        params, prev, new, action, codes, 1, aux[AUX_PC_NONE_B]
    )

    # Which clauses are evaluated this step (verifier.py:465-487, :506-528,
    # :552-566).
    is_single = comb == COMB_SINGLE
    is_before = comb == COMB_BEFORE
    is_after = comb == COMB_AFTER
    is_and = comb == COMB_AND

    eval_a = (
        is_single
        | (is_before & (a_done != 1))
        | (is_after & ((b_done == 1) | (res_b == 1) & (b_done != 1)))
        | (is_after & (comb_strict == 1) & (b_done != 1))
        | (is_and & (a_done != 1))
    )
    eval_b = (
        (is_before & ((a_done == 1) | ((a_done != 1) & (res_a == 1))))
        | (is_before & (comb_strict == 1) & (a_done != 1))
        | (is_after & (b_done != 1))
        | (is_and & (b_done != 1))
    )

    # Commit leaf state only where evaluated.
    pc_none_a = jnp.where(eval_a, pc_a, aux[AUX_PC_NONE_A])
    pc_none_b = jnp.where(eval_b, pc_b, aux[AUX_PC_NONE_B])
    marks = jnp.where(eval_a, marks_a, new.marks)
    cmarks = jnp.where(eval_a, cm_a, new.carrying_marks)
    # B's remembered bit lives in a different bit position, so apply on top.
    marks = jnp.where(eval_b, (marks & ~jnp.uint8(BIT_REMEMBER_B)) | (marks_b & jnp.uint8(BIT_REMEMBER_B)), marks)
    cmarks = jnp.where(eval_b, (cmarks & ~jnp.uint8(BIT_REMEMBER_B)) | (cm_b & jnp.uint8(BIT_REMEMBER_B)), cmarks)

    # Combinator state machine.
    # single
    s_status = res_a
    # before (verifier.py:465-487)
    b_active = a_done == 1
    bf_status = jnp.where(
        b_active,
        res_b,
        jnp.where(
            res_a == 2,
            2,
            jnp.where(
                res_a == 1,
                res_b,  # recurse into b on the same step
                jnp.where((comb_strict == 1) & (res_b == 1), 2, 0),
            ),
        ),
    )
    bf_a_done = jnp.where(b_active, a_done, res_a)
    bf_b_done = jnp.where(b_active | (res_a == 1), res_b, b_done)
    # after (verifier.py:506-528): mirror image
    a_active = b_done == 1
    af_status = jnp.where(
        a_active,
        res_a,
        jnp.where(
            res_b == 2,
            2,
            jnp.where(
                res_b == 1,
                res_a,
                jnp.where((comb_strict == 1) & (res_a == 1), 2, 0),
            ),
        ),
    )
    af_b_done = jnp.where(a_active, b_done, res_b)
    af_a_done = jnp.where(a_active | (res_b == 1), res_a, a_done)
    # and (verifier.py:552-566): failures are not terminal
    and_a = jnp.where(a_done == 1, 1, res_a)
    and_b = jnp.where(b_done == 1, 1, res_b)
    and_status = jnp.where((and_a == 1) & (and_b == 1), 1, 0)

    status = jnp.where(
        is_single,
        s_status,
        jnp.where(is_before, bf_status, jnp.where(is_after, af_status, and_status)),
    )
    new_a_done = jnp.where(
        is_before, bf_a_done, jnp.where(is_after, af_a_done, jnp.where(is_and, and_a, a_done))
    )
    new_b_done = jnp.where(
        is_before, bf_b_done, jnp.where(is_after, af_b_done, jnp.where(is_and, and_b, b_done))
    )

    aux = (
        aux.at[AUX_A_DONE].set(new_a_done)
        .at[AUX_B_DONE].set(new_b_done)
        .at[AUX_PC_NONE_A].set(pc_none_a)
        .at[AUX_PC_NONE_B].set(pc_none_b)
    )
    new = new.replace(aux=aux, marks=marks, carrying_marks=cmarks)

    succeeded = status == 1
    failed = status == 2
    # _reward uses the per-episode max_steps (minigrid_env.py:235-240 via
    # roomgrid_level.py:96-98).
    r_succ = 1.0 - 0.9 * (
        new.step_count.astype(jnp.float32) / aux[AUX_MAX_STEPS].astype(jnp.float32)
    )
    reward = jnp.where(succeeded, r_succ, jnp.where(failed, 0.0, reward))
    terminated = terminated | succeeded | failed
    return new, reward, terminated


# -- mission surface text (host-side) ---------------------------------------


def surface_text(codes) -> str:
    """Exact reference mission string (Instr.surface / ObjDesc.surface)."""
    codes = np.asarray(codes)

    def desc(slot):
        base = 2 + (slot // 2) * 10 + 2 + (slot % 2) * 4
        t, c, loc, plural = codes[base], codes[base + 1], codes[base + 2], codes[base + 3]
        s = OBJ_TYPE_NAMES.get(int(t), "object")
        if c != COLOR_ANY:
            s = COLOR_NAMES6[int(c)] + " " + s
        if loc != LOC_NONE:
            s += LOC_SUFFIX[int(loc)]
        return ("a " if plural else "the ") + s

    def clause_text(which):
        kind = int(codes[2 + which * 10])
        d1, d2 = which * 2, which * 2 + 1
        if kind == KIND_GOTO:
            return "go to " + desc(d1)
        if kind == KIND_OPEN:
            return "open " + desc(d1)
        if kind == KIND_PICKUP:
            return "pick up " + desc(d1)
        if kind == KIND_PUTNEXT:
            return "put " + desc(d1) + " next to " + desc(d2)
        return ""

    comb = int(codes[0])
    a, b = clause_text(0), clause_text(1)
    if comb == COMB_SINGLE:
        return a
    if comb == COMB_BEFORE:
        return a + ", then " + b
    if comb == COMB_AFTER:
        return a + " after you " + b
    return a + " and " + b
