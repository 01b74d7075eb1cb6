"""Seed-parity twin for the full BabyAI stack (all 96 registered ids).

Extends the draw-order twin (utils/parity_twin.py) with a twin of the
BabyAI generation machinery: the instruction grammar (verifier.py ObjDesc /
Instr classes), mission validation (`validate_instrs`
roomgrid_level.py:144-196, `check_objs_reachable` :249-301), the per-level
``gen_mission`` bodies (goto/open/pickup/putnext/unlock/other/synth.py) and
the generic ``LevelGen`` sampler (levelgen.py).  Every ``self.np_random.X``
draw in the reference path has a twin call in identical order, so
``twin_layout("BabyAI-…", seed)`` reproduces ``env.reset(seed)``'s layout
and instruction tree without importing the reference.

The twin honours the reference's accidental semantics as well as its
intended ones (both affect the draw stream):

* ``ik is id`` / ``i is not id`` comparisons on ``np.int64`` draws are
  always False / True (fresh objects), so the "key not in locked room"
  retry loops in Unlock (unlock.py:30-37) and GoToImpUnlock
  (goto.py:471-478) accept their first draw, and the "skip the locked
  room" distractor filters add distractors to *every* room.
* ``self.locked_room`` is only assigned, never cleared, across the
  regenerate-on-reject attempts inside one reset
  (roomgrid_level.py:118-139 + levelgen.py:52,104), so a later attempt
  without a locked room still filters ``rand_obj`` descriptors against the
  stale room's rectangle (levelgen.py:139-151).
* ``ObjDesc(None, color)`` matches every cell of that colour — including
  walls (verifier.py:104-141 has no object-type filter when type is None).

``extra["instrs"]`` carries the twin instruction tree; ``encode_instrs``
lowers it to the device mission-code vector + identity mark planes with the
exact layout `envs/babyai/core.py` defines (mirroring
utils/parity.py:babyai_from_reference, but from twin objects).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from minigrid_dynamicprogramming_tpu.core.constants import (
    COLOR_NAMES,
    COLOR_TO_IDX,
)
from minigrid_dynamicprogramming_tpu.utils.parity_twin import (
    RoomGridTwin,
    TwinLayout,
    TwinObj,
    _DIR_VEC,
    _twin,
)

# verifier.py:14-21
OBJ_TYPES = ["box", "ball", "key", "door"]
OBJ_TYPES_NOT_DOOR = ["box", "ball", "key"]
LOC_NAMES = ["left", "right", "front", "behind"]
_LOC_IDX = {None: 0, "left": 1, "right": 2, "front": 3, "behind": 4}


class _Reject(Exception):
    """Twin of roomgrid_level.RejectSampling (and of the RecursionError
    raised by rand_obj after max_tries, levelgen.py:122-126)."""


# ---------------------------------------------------------------------------
# Instruction model (twin of verifier.py ObjDesc / Instr classes)
# ---------------------------------------------------------------------------


class TwinDesc:
    """ObjDesc twin: (type, color, loc) + the matching object set."""

    __slots__ = ("type", "color", "loc", "obj_set")

    def __init__(self, type_: Optional[str], color: Optional[str] = None,
                 loc: Optional[str] = None):
        self.type = type_
        self.color = color
        self.loc = loc
        self.obj_set: List[TwinObj] = []

    def find_matching(self, t: RoomGridTwin) -> List[TwinObj]:
        """verifier.py:104-169 — column-major scan; loc predicates apply
        only inside the agent's start room; type=None matches any cell."""
        self.obj_set = []
        agent_room = t.room_from_pos(*t.agent_pos)
        ax, ay = t.agent_pos
        d1 = _DIR_VEC[t.agent_dir]
        d2 = (-d1[1], d1[0])
        for i in range(t.width):
            for j in range(t.height):
                cell = t.get(i, j)
                if cell is None:
                    continue
                if self.type is not None and cell.type != self.type:
                    continue
                if self.color is not None and cell.color != self.color:
                    continue
                if self.loc in LOC_NAMES:
                    if not agent_room.pos_inside(i, j):
                        continue
                    v = (i - ax, j - ay)
                    dot1 = v[0] * d1[0] + v[1] * d1[1]
                    dot2 = v[0] * d2[0] + v[1] * d2[1]
                    ok = {
                        "left": dot2 < 0,
                        "right": dot2 > 0,
                        "front": dot1 > 0,
                        "behind": dot1 < 0,
                    }[self.loc]
                    if not ok:
                        continue
                self.obj_set.append(cell)
        return self.obj_set


class TwinInstr:
    kind = None  # "goto" | "open" | "pickup" | "putnext" | "and" | "before" | "after"


class TwinAction(TwinInstr):
    def __init__(self, kind: str, desc: TwinDesc, strict: bool = False):
        self.kind = kind
        self.desc = desc
        self.strict = strict

    @property
    def descs(self) -> Tuple[TwinDesc, ...]:
        return (self.desc,)


class TwinPutNext(TwinInstr):
    kind = "putnext"

    def __init__(self, desc_move: TwinDesc, desc_fixed: TwinDesc,
                 strict: bool = False):
        self.desc_move = desc_move
        self.desc_fixed = desc_fixed
        self.strict = strict

    @property
    def descs(self) -> Tuple[TwinDesc, ...]:
        return (self.desc_move, self.desc_fixed)


class TwinSeq(TwinInstr):
    def __init__(self, kind: str, a: TwinInstr, b: TwinInstr,
                 strict: bool = False):
        self.kind = kind  # "and" | "before" | "after"
        self.instr_a = a
        self.instr_b = b
        self.strict = strict


def _leaves(instrs: TwinInstr):
    """Leaf instructions in (clause, leaf) slot order, as encoded."""
    if isinstance(instrs, TwinSeq) and instrs.kind in ("before", "after"):
        clauses = [instrs.instr_a, instrs.instr_b]
    else:
        clauses = [instrs]
    out = []
    for c, node in enumerate(clauses):
        if isinstance(node, TwinSeq) and node.kind == "and":
            out.append((c, 0, node.instr_a))
            out.append((c, 1, node.instr_b))
        else:
            out.append((c, 0, node))
    return out


def _all_descs(instrs: TwinInstr) -> List[TwinDesc]:
    return [d for _, _, leaf in _leaves(instrs) for d in leaf.descs]


def num_navs(instrs: TwinInstr) -> int:
    """roomgrid_level.py:215-233."""
    if isinstance(instrs, TwinPutNext):
        return 2
    if isinstance(instrs, TwinAction):
        return 1
    return num_navs(instrs.instr_a) + num_navs(instrs.instr_b)


# ---------------------------------------------------------------------------
# Validation (twin of roomgrid_level.py:144-301)
# ---------------------------------------------------------------------------


def _pos_next_to(a, b) -> bool:
    return abs(a[0] - b[0]) + abs(a[1] - b[1]) == 1


def check_objs_reachable(t: RoomGridTwin, raise_exc: bool = True) -> bool:
    """roomgrid_level.py:249-301 — flood fill from the agent; doors (even
    locked) are traversable; any unreachable non-wall cell rejects."""
    reachable = set()
    stack = [tuple(t.agent_pos)]
    while stack:
        i, j = stack.pop()
        if i < 0 or i >= t.width or j < 0 or j >= t.height:
            continue
        if (i, j) in reachable:
            continue
        reachable.add((i, j))
        cell = t.get(i, j)
        if cell is not None and cell.type != "door":
            continue
        stack.extend([(i + 1, j), (i - 1, j), (i, j + 1), (i, j - 1)])
    for i in range(t.width):
        for j in range(t.height):
            cell = t.get(i, j)
            if cell is None or cell.type == "wall":
                continue
            if (i, j) not in reachable:
                if not raise_exc:
                    return False
                raise _Reject(f"unreachable object at {(i, j)}")
    return True


def validate_instrs(t: RoomGridTwin, instr: TwinInstr,
                    unblocking: Optional[bool]) -> None:
    """roomgrid_level.py:144-196.  ``unblocking`` is None for non-LevelGen
    levels (no ``unblocking`` attribute — the key/locked-door check is
    skipped entirely)."""
    locked_colors = []
    if unblocking:
        for i in range(t.num_cols):
            for j in range(t.num_rows):
                room = t.get_room(i, j)
                for door in room.doors:
                    if isinstance(door, TwinObj) and door.state == 2:
                        locked_colors.append(door.color)

    if isinstance(instr, TwinPutNext):
        instr.desc_move.find_matching(t)
        instr.desc_fixed.find_matching(t)
        move_set = instr.desc_move.obj_set
        fixed_set = instr.desc_fixed.obj_set
        if any(any(a is b for b in fixed_set) for a in move_set):
            raise _Reject("objects match both lhs and rhs of PutNext")
        for a in move_set:
            for b in fixed_set:
                if _pos_next_to(a.pos, b.pos):
                    raise _Reject("objs already next to each other")
        if len(move_set) == 1 and len(fixed_set) == 1:
            if move_set[0] is fixed_set[0]:
                raise _Reject("cannot move an object next to itself")

    if isinstance(instr, (TwinAction, TwinPutNext)):
        if not unblocking:
            return
        for desc in instr.descs:
            if desc.type == "key" and desc.color in locked_colors:
                raise _Reject("key matching a locked door color")
        return

    validate_instrs(t, instr.instr_a, unblocking)
    validate_instrs(t, instr.instr_b, unblocking)


# ---------------------------------------------------------------------------
# Generation driver (twin of RoomGridLevel._gen_grid, roomgrid_level.py:118-143)
# ---------------------------------------------------------------------------


def open_all_doors(t: RoomGridTwin) -> None:
    """roomgrid_level.py:237-247 (via goto.py GoTo.doors_open)."""
    for j in range(t.height):
        for i in range(t.width):
            cell = t.get(i, j)
            if cell is not None and cell.type == "door":
                cell.state = 0


def gen_level(seed, build, room_size=8, num_rows=3, num_cols=3,
              fixed_max_steps: Optional[int] = None,
              unblocking: Optional[bool] = None) -> TwinLayout:
    """Lattice + gen_mission + validation, regenerating with the *same*
    generator on rejection.  ``build(t)`` returns the instruction tree (or
    ``(instrs, carry_obj)`` for PutNext's start_carrying reset hook)."""
    t = RoomGridTwin(room_size, num_rows, num_cols, seed)
    while True:
        try:
            t.gen_lattice()
            result = build(t)
            instrs = result[0] if isinstance(result, tuple) else result
            validate_instrs(t, instrs, unblocking)
        except (RecursionError, _Reject):
            continue
        break
    carry = result[1] if isinstance(result, tuple) else None

    # reset_verifier + surface() resolve every descriptor against the final
    # grid/agent pose (roomgrid_level.py:74, :141-142, verifier.py:72-101).
    for desc in _all_descs(instrs):
        desc.find_matching(t)
        assert len(desc.obj_set) > 0, "no object matching description"

    if fixed_max_steps is not None:
        max_steps = fixed_max_steps
    else:  # roomgrid_level.py:76-83
        max_steps = num_navs(instrs) * room_size**2 * num_rows * num_cols

    # PutNext start_carrying (putnext.py:192-201): the object is lifted off
    # the grid after reset — the exported planes reflect the post-reset grid
    # (cells[...] cleared directly so carry.pos keeps the init position the
    # reference's cur_pos retains for mark encoding).
    if carry is not None:
        t.cells[carry.pos[1]][carry.pos[0]] = None

    return TwinLayout(t, instrs=instrs, max_steps=max_steps, carry=carry)


# ---------------------------------------------------------------------------
# Device encoding (mirrors utils/parity.py:babyai_from_reference over twins)
# ---------------------------------------------------------------------------

_KIND_CODE = {"goto": 1, "open": 2, "pickup": 3, "putnext": 4}
_COMB_CODE = {"single": 0, "before": 1, "after": 2}
_TYPE_CODE = {None: 0, "door": 4, "key": 5, "ball": 6, "box": 7,
              "wall": 2, "goal": 8, "lava": 9, "floor": 3}


def encode_instrs(layout: TwinLayout, mission_slots: int):
    """Lower a twin instruction tree to (mission codes, marks,
    carrying_marks) in the envs/babyai/core.py layout."""
    from minigrid_dynamicprogramming_tpu.envs.babyai import core as B

    instrs = layout.extra["instrs"]
    carry = layout.extra.get("carry")
    h, w = layout.grid_obj.shape
    codes = np.zeros((mission_slots,), dtype=np.int32)
    marks = np.zeros((h, w), dtype=np.uint16)
    carrying_marks = 0

    if isinstance(instrs, TwinSeq) and instrs.kind in ("before", "after"):
        codes[0] = _COMB_CODE[instrs.kind]
        codes[1] = int(instrs.strict)
        clauses = [(0, instrs.instr_a), (1, instrs.instr_b)]
    else:
        codes[0] = B.COMB_SINGLE
        clauses = [(0, instrs)]

    for c, node in clauses:
        if isinstance(node, TwinSeq):  # "and"
            codes[B.CLAUSE_OFF[c]] = 1

    for c, l, leaf in _leaves(instrs):
        base = B._leaf_base(c, l)
        codes[base] = _KIND_CODE[leaf.kind]
        codes[base + 1] = int(getattr(leaf, "strict", False))
        for d, desc in enumerate(leaf.descs):
            dbase = B._desc_base(c, l, d)
            codes[dbase] = _TYPE_CODE[desc.type]
            codes[dbase + 1] = (
                B.COLOR_ANY if desc.color is None else COLOR_TO_IDX[desc.color]
            )
            codes[dbase + 2] = _LOC_IDX[desc.loc]
            codes[dbase + 3] = int(len(desc.obj_set) > 1)
            bit = B.desc_bit(c, l, d)
            for obj in desc.obj_set:
                x, y = obj.pos
                marks[y, x] |= bit
            if carry is not None and any(carry is o for o in desc.obj_set):
                carrying_marks |= bit

    return codes, marks, carrying_marks


# ---------------------------------------------------------------------------
# Level builders (one per reference gen_mission)
# ---------------------------------------------------------------------------


def _goto_red_ball(num_dists, grey_dists):
    """goto.py GoToRedBallGrey/GoToRedBall(/NoDists) gen_mission."""

    def build(t):
        t.place_agent_room()
        obj, _ = t.add_object(0, 0, "ball", "red")
        dists = t.add_distractors(num_distractors=num_dists, all_unique=False)
        if grey_dists:
            for d in dists:
                d.color = "grey"
        check_objs_reachable(t)
        return TwinAction("goto", TwinDesc(obj.type, obj.color))

    return build


def _goto_obj(t):
    """goto.py GoToObj.gen_mission."""
    t.place_agent_room()
    objs = t.add_distractors(num_distractors=1)
    obj = objs[0]
    return TwinAction("goto", TwinDesc(obj.type, obj.color))


def _goto_local(num_dists):
    def build(t):
        t.place_agent_room()
        objs = t.add_distractors(num_distractors=num_dists, all_unique=False)
        check_objs_reachable(t)
        obj = t.rand_elem(objs)
        return TwinAction("goto", TwinDesc(obj.type, obj.color))

    return build


def _goto(num_dists, doors_open):
    """goto.py GoTo.gen_mission."""

    def build(t):
        t.place_agent_room()
        t.connect_all()
        objs = t.add_distractors(num_distractors=num_dists, all_unique=False)
        check_objs_reachable(t)
        obj = t.rand_elem(objs)
        instrs = TwinAction("goto", TwinDesc(obj.type, obj.color))
        if doors_open:
            open_all_doors(t)
        return instrs

    return build


def _goto_imp_unlock_build(t):
    """goto.py GoToImpUnlock.gen_mission.  The ``ik is id`` numpy no-op
    accepts the first key-room draw, and ``i is not id or j is not jd`` puts
    distractors in every room (see module docstring)."""
    id_ = t.rand_int(0, t.num_cols)
    jd = t.rand_int(0, t.num_rows)
    door, _ = t.add_door(id_, jd, locked=True)
    locked_room = t.get_room(id_, jd)
    ik = t.rand_int(0, t.num_cols)
    jk = t.rand_int(0, t.num_rows)
    t.add_object(ik, jk, "key", door.color)
    t.connect_all()
    for i in range(t.num_cols):
        for j in range(t.num_rows):
            t.add_distractors(i, j, num_distractors=2, all_unique=False)
    while True:
        t.place_agent_room()
        if t.room_from_pos(*t.agent_pos) is locked_room:
            continue
        break
    check_objs_reachable(t)
    (obj,) = t.add_distractors(id_, jd, num_distractors=1, all_unique=False)
    return TwinAction("goto", TwinDesc(obj.type, obj.color))


def _goto_red_blue_ball(num_dists):
    def build(t):
        t.place_agent_room()
        dists = t.add_distractors(num_distractors=num_dists, all_unique=False)
        for d in dists:
            if d.type == "ball" and d.color in ("blue", "red"):
                raise _Reject("can only have one blue or red ball")
        color = t.rand_elem(["red", "blue"])
        obj, _ = t.add_object(0, 0, "ball", color)
        check_objs_reachable(t)
        return TwinAction("goto", TwinDesc(obj.type, obj.color))

    return build


def _goto_door(t):
    """goto.py GoToDoor.gen_mission."""
    doors = []
    for _ in range(4):
        door, _ = t.add_door(1, 1)
        doors.append(door)
    t.place_agent_room(1, 1)
    obj = t.rand_elem(doors)
    return TwinAction("goto", TwinDesc("door", obj.color))


def _goto_obj_door(t):
    t.place_agent_room(1, 1)
    objs = t.add_distractors(1, 1, num_distractors=8, all_unique=False)
    for _ in range(4):
        door, _ = t.add_door(1, 1)
        objs.append(door)
    check_objs_reachable(t)
    obj = t.rand_elem(objs)
    return TwinAction("goto", TwinDesc(obj.type, obj.color))


def _collect_doors(t):
    """Room-major door scan (open.py Open.gen_mission): each shared door
    appears once per adjoining room, as in the reference list."""
    doors = []
    for i in range(t.num_cols):
        for j in range(t.num_rows):
            for door in t.get_room(i, j).doors:
                if isinstance(door, TwinObj):
                    doors.append(door)
    return doors


def _open(t):
    t.place_agent_room()
    t.connect_all()
    t.add_distractors(num_distractors=18, all_unique=False)
    check_objs_reachable(t)
    door = t.rand_elem(_collect_doors(t))
    return TwinAction("open", TwinDesc(door.type, door.color))


def _open_red_door(t):
    t.add_door(0, 0, 0, "red", locked=False)
    t.place_agent_room(0, 0)
    return TwinAction("open", TwinDesc("door", "red"))


def _open_door(debug, select_by):
    def build(t):
        door_colors = t.rand_subset(COLOR_NAMES, 4)
        objs = []
        for i, color in enumerate(door_colors):
            obj, _ = t.add_door(1, 1, door_idx=i, color=color, locked=False)
            objs.append(obj)
        sel = select_by or t.rand_elem(["color", "loc"])
        if sel == "color":
            desc = TwinDesc(objs[0].type, color=objs[0].color)
        else:
            desc = TwinDesc(objs[0].type, loc=t.rand_elem(LOC_NAMES))
        t.place_agent_room(1, 1)
        return TwinAction("open", desc, strict=debug)

    return build


def _open_two_doors(first_color, second_color, strict):
    def build(t):
        colors = t.rand_subset(COLOR_NAMES, 2)
        c1 = first_color if first_color is not None else colors[0]
        c2 = second_color if second_color is not None else colors[1]
        door1, _ = t.add_door(1, 1, 2, color=c1, locked=False)
        door2, _ = t.add_door(1, 1, 0, color=c2, locked=False)
        t.place_agent_room(1, 1)
        return TwinSeq(
            "before",
            TwinAction("open", TwinDesc(door1.type, door1.color), strict=strict),
            TwinAction("open", TwinDesc(door2.type, door2.color)),
        )

    return build


def _open_doors_order(num_doors, debug):
    def build(t):
        colors = t.rand_subset(COLOR_NAMES, num_doors)
        doors = []
        for i in range(num_doors):
            door, _ = t.add_door(1, 1, color=colors[i], locked=False)
            doors.append(door)
        t.place_agent_room(1, 1)
        door1, door2 = t.rand_subset(doors, 2)
        d1 = TwinDesc(door1.type, door1.color)
        d2 = TwinDesc(door2.type, door2.color)
        mode = t.rand_int(0, 3)
        if mode == 0:
            return TwinAction("open", d1, strict=debug)
        a = TwinAction("open", d1, strict=debug)
        b = TwinAction("open", d2, strict=debug)
        return TwinSeq("before" if mode == 1 else "after", a, b)

    return build


def _pickup(t):
    t.place_agent_room()
    t.connect_all()
    objs = t.add_distractors(num_distractors=18, all_unique=False)
    check_objs_reachable(t)
    obj = t.rand_elem(objs)
    return TwinAction("pickup", TwinDesc(obj.type, obj.color))


def _unblock_pickup(t):
    t.place_agent_room()
    t.connect_all()
    objs = t.add_distractors(num_distractors=20, all_unique=False)
    if check_objs_reachable(t, raise_exc=False):
        raise _Reject("all objects reachable")
    obj = t.rand_elem(objs)
    return TwinAction("pickup", TwinDesc(obj.type, obj.color))


def _pickup_dist(debug):
    def build(t):
        objs = t.add_distractors(num_distractors=5)
        t.place_agent_room(0, 0)
        obj = t.rand_elem(objs)
        type_, color = obj.type, obj.color
        sel = t.rand_elem(["type", "color", "both"])
        if sel == "color":
            type_ = None
        elif sel == "type":
            color = None
        return TwinAction("pickup", TwinDesc(type_, color), strict=debug)

    return build


def _pickup_above(t):
    obj, _ = t.add_object(1, 0)
    t.add_door(1, 1, 3, locked=False)
    t.place_agent_room(1, 1)
    t.connect_all()
    return TwinAction("pickup", TwinDesc(obj.type, obj.color))


def _putnext_local(num_objs):
    def build(t):
        t.place_agent_room()
        objs = t.add_distractors(num_distractors=num_objs, all_unique=True)
        check_objs_reachable(t)
        o1, o2 = t.rand_subset(objs, 2)
        return TwinPutNext(TwinDesc(o1.type, o1.color), TwinDesc(o2.type, o2.color))

    return build


def _putnext(objs_per_room, start_carrying):
    def build(t):
        t.place_agent_room(0, 0)
        objs_l = t.add_distractors(0, 0, objs_per_room)
        objs_r = t.add_distractors(1, 0, objs_per_room)
        t.remove_wall(0, 0, 0)
        a = t.rand_elem(objs_l)
        b = t.rand_elem(objs_r)
        if t.rand_bool():
            a, b = b, a
        instrs = TwinPutNext(TwinDesc(a.type, a.color), TwinDesc(b.type, b.color))
        return (instrs, a) if start_carrying else instrs

    return build


def _unlock(t):
    """unlock.py Unlock.gen_mission (numpy-``is`` no-ops preserved)."""
    id_ = t.rand_int(0, t.num_cols)
    jd = t.rand_int(0, t.num_rows)
    door, _ = t.add_door(id_, jd, locked=True)
    locked_room = t.get_room(id_, jd)
    ik = t.rand_int(0, t.num_cols)
    jk = t.rand_int(0, t.num_rows)
    t.add_object(ik, jk, "key", door.color)
    if t.rand_bool():
        colors = [c for c in COLOR_NAMES if c != door.color]
        t.connect_all(door_colors=colors)
    else:
        t.connect_all()
    for i in range(t.num_cols):
        for j in range(t.num_rows):
            t.add_distractors(i, j, num_distractors=3, all_unique=False)
    while True:
        t.place_agent_room()
        if t.room_from_pos(*t.agent_pos) is locked_room:
            continue
        break
    check_objs_reachable(t)
    return TwinAction("open", TwinDesc(door.type, door.color))


def _unlock_local(distractors):
    def build(t):
        door, _ = t.add_door(1, 1, locked=True)
        t.add_object(1, 1, "key", door.color)
        if distractors:
            t.add_distractors(1, 1, num_distractors=3)
        t.place_agent_room(1, 1)
        return TwinAction("open", TwinDesc(door.type))

    return build


def _key_in_box(t):
    door, _ = t.add_door(1, 1, locked=True)
    key = TwinObj("key", door.color)
    box = TwinObj("box", t.rand_color(), contains=key)
    t.place_in_room(1, 1, box)
    t.place_agent_room(1, 1)
    return TwinAction("open", TwinDesc(door.type))


def _unlock_pickup(distractors):
    def build(t):
        obj, _ = t.add_object(1, 0, kind="box")
        door, _ = t.add_door(0, 0, 0, locked=True)
        t.add_object(0, 0, "key", door.color)
        if distractors:
            t.add_distractors(num_distractors=4)
        t.place_agent_room(0, 0)
        return TwinAction("pickup", TwinDesc(obj.type, obj.color))

    return build


def _blocked_unlock_pickup(t):
    obj, _ = t.add_object(1, 0, kind="box")
    door, pos = t.add_door(0, 0, 0, locked=True)
    color = t.rand_color()
    t.set(pos[0] - 1, pos[1], TwinObj("ball", color))
    t.add_object(0, 0, "key", door.color)
    t.place_agent_room(0, 0)
    return TwinAction("pickup", TwinDesc(obj.type))


def _unlock_to_unlock(t):
    colors = t.rand_subset(COLOR_NAMES, 2)
    t.add_door(0, 0, door_idx=0, color=colors[0], locked=True)
    t.add_object(2, 0, kind="key", color=colors[0])
    t.add_door(1, 0, door_idx=0, color=colors[1], locked=True)
    t.add_object(1, 0, kind="key", color=colors[1])
    obj, _ = t.add_object(0, 0, kind="ball")
    t.place_agent_room(1, 0)
    return TwinAction("pickup", TwinDesc(obj.type))


def _action_obj_door(t):
    objs = t.add_distractors(1, 1, num_distractors=5)
    for _ in range(4):
        door, _ = t.add_door(1, 1, locked=False)
        objs.append(door)
    t.place_agent_room(1, 1)
    obj = t.rand_elem(objs)
    desc = TwinDesc(obj.type, obj.color)
    if obj.type == "door":
        return TwinAction("goto" if t.rand_bool() else "open", desc)
    return TwinAction("goto" if t.rand_bool() else "pickup", desc)


def _find_obj(t):
    """other.py FindObjS5.gen_mission — i is drawn from num_rows but used
    as the column (reference quirk, square grids only)."""
    i = t.rand_int(0, t.num_rows)
    j = t.rand_int(0, t.num_cols)
    obj, _ = t.add_object(i, j)
    t.place_agent_room(1, 1)
    t.connect_all()
    return TwinAction("pickup", TwinDesc(obj.type))


def _key_corridor(obj_type):
    def build(t):
        for j in range(1, t.num_rows):
            t.remove_wall(1, j, 3)
        room_idx = t.rand_int(0, t.num_rows)
        door, _ = t.add_door(2, room_idx, 2, locked=True)
        obj, _ = t.add_object(2, room_idx, kind=obj_type)
        t.add_object(0, t.rand_int(0, t.num_rows), "key", door.color)
        t.place_agent_room(1, t.num_rows // 2)
        t.connect_all()
        return TwinAction("pickup", TwinDesc(obj.type))

    return build


def _one_room(t):
    obj, _ = t.add_object(0, 0, kind="ball")
    t.place_agent_room()
    return TwinAction("pickup", TwinDesc(obj.type))


def _move_two_across(objs_per_room):
    def build(t):
        t.place_agent_room(0, 0)
        objs_l = t.add_distractors(0, 0, objs_per_room)
        objs_r = t.add_distractors(1, 0, objs_per_room)
        t.remove_wall(0, 0, 0)
        objs_l = t.rand_subset(objs_l, 2)
        objs_r = t.rand_subset(objs_r, 2)
        a, d = objs_l
        b, c = objs_r
        return TwinSeq(
            "before",
            TwinPutNext(TwinDesc(a.type, a.color), TwinDesc(b.type, b.color)),
            TwinPutNext(TwinDesc(c.type, c.color), TwinDesc(d.type, d.color)),
        )

    return build


# ---------------------------------------------------------------------------
# LevelGen twin (levelgen.py)
# ---------------------------------------------------------------------------


class LevelGenTwin:
    def __init__(self, num_dists=18, locked_room_prob=0.5, locations=True,
                 unblocking=True, implicit_unlock=True,
                 action_kinds=("goto", "pickup", "open", "putnext"),
                 instr_kinds=("action", "and", "seq")):
        self.num_dists = num_dists
        self.locked_room_prob = locked_room_prob
        self.locations = locations
        self.unblocking = unblocking
        self.implicit_unlock = implicit_unlock
        self.action_kinds = list(action_kinds)
        self.instr_kinds = list(instr_kinds)
        # Persists across regenerate attempts (levelgen.py:52 — assigned,
        # never cleared; stale rooms keep their rect for rand_obj filtering).
        self.locked_room = None

    def build(self, t: RoomGridTwin) -> TwinInstr:
        if t.rand_float(0.0, 1.0) < self.locked_room_prob:
            self.add_locked_room(t)
        t.connect_all()
        t.add_distractors(num_distractors=self.num_dists, all_unique=False)
        while True:
            t.place_agent_room()
            if t.room_from_pos(*t.agent_pos) is self.locked_room:
                continue
            break
        if not self.unblocking:
            check_objs_reachable(t)
        return self.rand_instr(t, self.action_kinds, self.instr_kinds)

    def add_locked_room(self, t: RoomGridTwin) -> None:
        while True:
            i = t.rand_int(0, t.num_cols)
            j = t.rand_int(0, t.num_rows)
            door_idx = t.rand_int(0, 4)
            self.locked_room = t.get_room(i, j)
            if self.locked_room.neighbors[door_idx] is None:
                continue
            door, _ = t.add_door(i, j, door_idx, locked=True)
            break
        while True:
            i = t.rand_int(0, t.num_cols)
            j = t.rand_int(0, t.num_rows)
            key_room = t.get_room(i, j)
            if key_room is self.locked_room:
                continue
            t.add_object(i, j, "key", door.color)
            break

    def rand_obj(self, t, types=OBJ_TYPES, colors=COLOR_NAMES,
                 max_tries=100) -> TwinDesc:
        num_tries = 0
        while True:
            if num_tries > max_tries:
                raise _Reject("failed to find suitable object")
            num_tries += 1
            color = t.rand_elem([None, *colors])
            type_ = t.rand_elem(types)
            loc = None
            if self.locations and t.rand_bool():
                loc = t.rand_elem(LOC_NAMES)
            desc = TwinDesc(type_, color, loc)
            objs = desc.find_matching(t)
            if len(objs) == 0:
                continue
            if not self.implicit_unlock and self.locked_room is not None:
                lr = self.locked_room
                if all(lr.pos_inside(*o.pos) for o in objs):
                    continue
            return desc

    def rand_instr(self, t, action_kinds, instr_kinds, depth=0) -> TwinInstr:
        kind = t.rand_elem(instr_kinds)
        if kind == "action":
            action = t.rand_elem(action_kinds)
            if action == "goto":
                return TwinAction("goto", self.rand_obj(t))
            if action == "pickup":
                return TwinAction("pickup", self.rand_obj(t, types=OBJ_TYPES_NOT_DOOR))
            if action == "open":
                return TwinAction("open", self.rand_obj(t, types=["door"]))
            return TwinPutNext(
                self.rand_obj(t, types=OBJ_TYPES_NOT_DOOR), self.rand_obj(t)
            )
        if kind == "and":
            a = self.rand_instr(t, action_kinds, ["action"], depth + 1)
            b = self.rand_instr(t, action_kinds, ["action"], depth + 1)
            return TwinSeq("and", a, b)
        # "seq"
        a = self.rand_instr(t, action_kinds, ["action", "and"], depth + 1)
        b = self.rand_instr(t, action_kinds, ["action", "and"], depth + 1)
        return TwinSeq(t.rand_elem(["before", "after"]), a, b)


def _levelgen(room_size=8, num_rows=3, num_cols=3, **cfg):
    def gen(seed):
        lg = LevelGenTwin(**cfg)
        return gen_level(seed, lg.build, room_size, num_rows, num_cols,
                         unblocking=lg.unblocking)

    return gen


# ---------------------------------------------------------------------------
# Registry (ids + kwargs mirror /root/reference/minigrid/__init__.py)
# ---------------------------------------------------------------------------


def _lvl(env_id, build, room_size=8, num_rows=3, num_cols=3,
         fixed_max_steps=None):
    _twin(env_id, lambda seed, b=build, rs=room_size, nr=num_rows,
          nc=num_cols, ms=fixed_max_steps: gen_level(seed, b, rs, nr, nc, ms))


_lvl("BabyAI-GoToRedBallGrey-v0", _goto_red_ball(7, True), 8, 1, 1)
_lvl("BabyAI-GoToRedBall-v0", _goto_red_ball(7, False), 8, 1, 1)
_lvl("BabyAI-GoToRedBallNoDists-v0", _goto_red_ball(0, False), 8, 1, 1)
_lvl("BabyAI-GoToObj-v0", _goto_obj, 8, 1, 1)
_lvl("BabyAI-GoToObjS4-v0", _goto_obj, 4, 1, 1)
_lvl("BabyAI-GoToObjS6-v1", _goto_obj, 6, 1, 1)
for _id, _rs, _nd in (
    ("BabyAI-GoToLocal-v0", 8, 8), ("BabyAI-GoToLocalS5N2-v0", 5, 2),
    ("BabyAI-GoToLocalS6N2-v0", 6, 2), ("BabyAI-GoToLocalS6N3-v0", 6, 3),
    ("BabyAI-GoToLocalS6N4-v0", 6, 4), ("BabyAI-GoToLocalS7N4-v0", 7, 4),
    ("BabyAI-GoToLocalS7N5-v0", 7, 5), ("BabyAI-GoToLocalS8N2-v0", 8, 2),
    ("BabyAI-GoToLocalS8N3-v0", 8, 3), ("BabyAI-GoToLocalS8N4-v0", 8, 4),
    ("BabyAI-GoToLocalS8N5-v0", 8, 5), ("BabyAI-GoToLocalS8N6-v0", 8, 6),
    ("BabyAI-GoToLocalS8N7-v0", 8, 7),
):
    _lvl(_id, _goto_local(_nd), _rs, 1, 1)
for _id, _kw in (
    ("BabyAI-GoTo-v0", dict(num_dists=18, doors_open=False)),
    ("BabyAI-GoToOpen-v0", dict(num_dists=18, doors_open=True)),
    ("BabyAI-GoToObjMaze-v0", dict(num_dists=1, doors_open=False)),
    ("BabyAI-GoToObjMazeOpen-v0", dict(num_dists=1, doors_open=True)),
):
    _lvl(_id, _goto(**_kw), 8, 3, 3)
_lvl("BabyAI-GoToObjMazeS4R2-v0", _goto(1, False), 4, 2, 2)
for _id, _rs in (("BabyAI-GoToObjMazeS4-v0", 4), ("BabyAI-GoToObjMazeS5-v0", 5),
                 ("BabyAI-GoToObjMazeS6-v0", 6), ("BabyAI-GoToObjMazeS7-v0", 7)):
    _lvl(_id, _goto(1, False), _rs, 3, 3)
_lvl("BabyAI-GoToImpUnlock-v0", _goto_imp_unlock_build, 8, 3, 3)
_twin("BabyAI-GoToSeq-v0", _levelgen(
    8, 3, 3, num_dists=18, action_kinds=["goto"], locked_room_prob=0,
    locations=False, unblocking=False))
_twin("BabyAI-GoToSeqS5R2-v0", _levelgen(
    5, 2, 2, num_dists=4, action_kinds=["goto"], locked_room_prob=0,
    locations=False, unblocking=False))
_lvl("BabyAI-GoToRedBlueBall-v0", _goto_red_blue_ball(7), 8, 1, 1)
_lvl("BabyAI-GoToDoor-v0", _goto_door, 7, 3, 3)
_lvl("BabyAI-GoToObjDoor-v0", _goto_obj_door, 8, 3, 3)

_lvl("BabyAI-Open-v0", _open, 8, 3, 3)
_lvl("BabyAI-OpenRedDoor-v0", _open_red_door, 5, 1, 2)
_lvl("BabyAI-OpenDoor-v0", _open_door(False, None), 8, 3, 3)
_lvl("BabyAI-OpenDoorDebug-v0", _open_door(True, None), 8, 3, 3)
_lvl("BabyAI-OpenDoorColor-v0", _open_door(False, "color"), 8, 3, 3)
_lvl("BabyAI-OpenDoorLoc-v0", _open_door(False, "loc"), 8, 3, 3)
_lvl("BabyAI-OpenTwoDoors-v0", _open_two_doors(None, None, False), 6, 3, 3, 720)
_lvl("BabyAI-OpenRedBlueDoors-v0", _open_two_doors("red", "blue", False),
     6, 3, 3, 720)
_lvl("BabyAI-OpenRedBlueDoorsDebug-v0", _open_two_doors("red", "blue", True),
     6, 3, 3, 720)
_lvl("BabyAI-OpenDoorsOrderN2-v0", _open_doors_order(2, False), 6, 3, 3, 720)
_lvl("BabyAI-OpenDoorsOrderN4-v0", _open_doors_order(4, False), 6, 3, 3, 720)
_lvl("BabyAI-OpenDoorsOrderN2Debug-v0", _open_doors_order(2, True), 6, 3, 3, 720)
_lvl("BabyAI-OpenDoorsOrderN4Debug-v0", _open_doors_order(4, True), 6, 3, 3, 720)

_lvl("BabyAI-Pickup-v0", _pickup, 8, 3, 3)
_lvl("BabyAI-UnblockPickup-v0", _unblock_pickup, 8, 3, 3)
_twin("BabyAI-PickupLoc-v0", _levelgen(
    8, 1, 1, num_dists=8, action_kinds=["pickup"], instr_kinds=["action"],
    locked_room_prob=0, locations=True, unblocking=False))
_lvl("BabyAI-PickupDist-v0", _pickup_dist(False), 7, 1, 1)
_lvl("BabyAI-PickupDistDebug-v0", _pickup_dist(True), 7, 1, 1)
_lvl("BabyAI-PickupAbove-v0", _pickup_above, 6, 3, 3, 288)

_lvl("BabyAI-PutNextLocal-v0", _putnext_local(8), 8, 1, 1)
_lvl("BabyAI-PutNextLocalS5N3-v0", _putnext_local(3), 5, 1, 1)
_lvl("BabyAI-PutNextLocalS6N4-v0", _putnext_local(4), 6, 1, 1)
for _id, _rs, _n, _c in (
    ("BabyAI-PutNextS4N1-v0", 4, 1, False), ("BabyAI-PutNextS5N2-v0", 5, 2, False),
    ("BabyAI-PutNextS5N1-v0", 5, 1, False), ("BabyAI-PutNextS6N3-v0", 6, 3, False),
    ("BabyAI-PutNextS7N4-v0", 7, 4, False),
    ("BabyAI-PutNextS5N2Carrying-v0", 5, 2, True),
    ("BabyAI-PutNextS6N3Carrying-v0", 6, 3, True),
    ("BabyAI-PutNextS7N4Carrying-v0", 7, 4, True),
):
    _lvl(_id, _putnext(_n, _c), _rs, 1, 2, 8 * _rs**2)

_lvl("BabyAI-Unlock-v0", _unlock, 8, 3, 3)
_lvl("BabyAI-UnlockLocal-v0", _unlock_local(False), 8, 3, 3)
_lvl("BabyAI-UnlockLocalDist-v0", _unlock_local(True), 8, 3, 3)
_lvl("BabyAI-KeyInBox-v0", _key_in_box, 8, 3, 3)
# UnlockPickup's `if max is None` tests the builtin (unlock.py:299) —
# max_steps flows as None and is computed at reset: 1 * 36 * 2 = 72.
_lvl("BabyAI-UnlockPickup-v0", _unlock_pickup(False), 6, 1, 2)
_lvl("BabyAI-UnlockPickupDist-v0", _unlock_pickup(True), 6, 1, 2)
_lvl("BabyAI-BlockedUnlockPickup-v0", _blocked_unlock_pickup, 6, 1, 2, 576)
_lvl("BabyAI-UnlockToUnlock-v0", _unlock_to_unlock, 6, 1, 3, 1080)

_lvl("BabyAI-ActionObjDoor-v0", _action_obj_door, 7, 3, 3)
for _id, _rs in (("BabyAI-FindObjS5-v0", 5), ("BabyAI-FindObjS6-v0", 6),
                 ("BabyAI-FindObjS7-v0", 7)):
    _lvl(_id, _find_obj, _rs, 3, 3, 20 * _rs**2)
_lvl("BabyAI-KeyCorridor-v0", _key_corridor("ball"), 6, 3, 3, 30 * 36)
for _id, _rs, _nr in (
    ("BabyAI-KeyCorridorS3R1-v0", 3, 1), ("BabyAI-KeyCorridorS3R2-v0", 3, 2),
    ("BabyAI-KeyCorridorS3R3-v0", 3, 3), ("BabyAI-KeyCorridorS4R3-v0", 4, 3),
    ("BabyAI-KeyCorridorS5R3-v0", 5, 3), ("BabyAI-KeyCorridorS6R3-v0", 6, 3),
):
    _lvl(_id, _key_corridor("ball"), _rs, _nr, 3, 30 * _rs**2)
for _id, _rs in (("BabyAI-OneRoomS8-v0", 8), ("BabyAI-OneRoomS12-v0", 12),
                 ("BabyAI-OneRoomS16-v0", 16), ("BabyAI-OneRoomS20-v0", 20)):
    _lvl(_id, _one_room, _rs, 1, 1)
_lvl("BabyAI-MoveTwoAcrossS5N2-v0", _move_two_across(2), 5, 1, 2, 16 * 25)
_lvl("BabyAI-MoveTwoAcrossS8N9-v0", _move_two_across(9), 8, 1, 2, 16 * 64)

_twin("BabyAI-Synth-v0", _levelgen(
    8, 3, 3, num_dists=18, instr_kinds=["action"], locations=False,
    unblocking=True, implicit_unlock=False))
_twin("BabyAI-SynthS5R2-v0", _levelgen(
    5, 2, 3, num_dists=18, instr_kinds=["action"], locations=False,
    unblocking=True, implicit_unlock=False))
_twin("BabyAI-SynthLoc-v0", _levelgen(
    8, 3, 3, num_dists=18, instr_kinds=["action"], locations=True,
    unblocking=True, implicit_unlock=False))
_twin("BabyAI-SynthSeq-v0", _levelgen(
    8, 3, 3, num_dists=18, locations=True, unblocking=True,
    implicit_unlock=False))
_twin("BabyAI-MiniBossLevel-v0", _levelgen(
    5, 2, 2, num_dists=7, locked_room_prob=0.25))
_twin("BabyAI-BossLevel-v0", _levelgen(8, 3, 3, num_dists=18))
_twin("BabyAI-BossLevelNoUnlock-v0", _levelgen(
    8, 3, 3, num_dists=18, locked_room_prob=0, implicit_unlock=False))
