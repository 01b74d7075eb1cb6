"""Host-side bridge between the reference Gymnasium envs and SoA state.

Used by the test rig only: a reference env (driven as the CPU oracle) is
snapshotted into an :class:`EnvState`, then both sides are stepped with the
same action script and must agree bit-exactly on observations, rewards and
termination — the strategy modeled on the reference's own determinism test
(/root/reference/tests/test_envs.py:48-103).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from minigrid_dynamicprogramming_tpu.core.constants import OBJ_EMPTY
from minigrid_dynamicprogramming_tpu.core.state import (
    AUX_SLOTS,
    MISSION_SLOTS,
    EnvParams,
    EnvState,
)


def state_from_reference(ref_env, rng=None) -> EnvState:
    """Snapshot a (reset) reference ``MiniGridEnv`` into an ``EnvState``."""
    env = ref_env.unwrapped
    w, h = env.width, env.height

    grid_obj = np.full((h, w), OBJ_EMPTY, dtype=np.uint8)
    grid_color = np.zeros((h, w), dtype=np.uint8)
    grid_state = np.zeros((h, w), dtype=np.uint8)
    contains_obj = np.full((h, w), OBJ_EMPTY, dtype=np.uint8)
    contains_color = np.zeros((h, w), dtype=np.uint8)

    for y in range(h):
        for x in range(w):
            cell = env.grid.get(x, y)
            if cell is None:
                continue
            t, c, s = cell.encode()
            grid_obj[y, x] = t
            grid_color[y, x] = c
            grid_state[y, x] = s
            if cell.type == "box" and cell.contains is not None:
                ct, cc, _ = cell.contains.encode()
                contains_obj[y, x] = ct
                contains_color[y, x] = cc

    if env.carrying is not None:
        ct, cc, _ = env.carrying.encode()
        carrying_obj, carrying_color = ct, cc
        if env.carrying.type == "box" and env.carrying.contains is not None:
            bt, bc, _ = env.carrying.contains.encode()
            carry_in_obj, carry_in_color = bt, bc
        else:
            carry_in_obj, carry_in_color = OBJ_EMPTY, 0
    else:
        carrying_obj, carrying_color = OBJ_EMPTY, 0
        carry_in_obj, carry_in_color = OBJ_EMPTY, 0

    if rng is None:
        import jax

        rng = jax.random.PRNGKey(0)

    return EnvState(
        grid_obj=jnp.asarray(grid_obj),
        grid_color=jnp.asarray(grid_color),
        grid_state=jnp.asarray(grid_state),
        contains_obj=jnp.asarray(contains_obj),
        contains_color=jnp.asarray(contains_color),
        marks=jnp.zeros((h, w), dtype=jnp.uint16),
        vmarks=jnp.zeros((h, w), dtype=jnp.uint16),
        carrying_marks=jnp.asarray(0, dtype=jnp.uint16),
        agent_pos=jnp.asarray(
            [int(env.agent_pos[0]), int(env.agent_pos[1])], dtype=jnp.int32
        ),
        agent_dir=jnp.asarray(int(env.agent_dir), dtype=jnp.int32),
        carrying_obj=jnp.asarray(carrying_obj, dtype=jnp.uint8),
        carrying_color=jnp.asarray(carrying_color, dtype=jnp.uint8),
        carrying_contains_obj=jnp.asarray(carry_in_obj, dtype=jnp.uint8),
        carrying_contains_color=jnp.asarray(carry_in_color, dtype=jnp.uint8),
        step_count=jnp.asarray(int(env.step_count), dtype=jnp.int32),
        terminated=jnp.asarray(False),
        truncated=jnp.asarray(False),
        aux=jnp.zeros((AUX_SLOTS,), dtype=jnp.int32),
        mission=jnp.zeros((MISSION_SLOTS,), dtype=jnp.int32),
        rng=rng,
    )


def params_from_reference(ref_env) -> EnvParams:
    env = ref_env.unwrapped
    return EnvParams(
        width=env.width,
        height=env.height,
        max_steps=env.max_steps,
        see_through_walls=env.see_through_walls,
        agent_view_size=env.agent_view_size,
    )


# --- per-family aux/mission snapshot --------------------------------------
# Environment step hooks read episode constants (target positions, door
# coordinates, ...) from ``state.aux``/``state.mission``; when snapshotting a
# reference env for trajectory parity those slots must be filled from the
# reference object's attributes.

_TYPE_IDX = {"key": 5, "ball": 6, "box": 7}
_COLOR_IDX = {
    "red": 0, "green": 1, "blue": 2, "purple": 3, "yellow": 4, "grey": 5,
}


def aux_from_reference(ref_env, state: EnvState) -> EnvState:
    env = ref_env.unwrapped
    name = type(env).__name__
    aux = np.zeros((AUX_SLOTS,), dtype=np.int32)
    mission = np.zeros((MISSION_SLOTS,), dtype=np.int32)

    if name == "FetchEnv":
        aux[0] = _TYPE_IDX[env.targetType]
        aux[1] = _COLOR_IDX[env.targetColor]
    elif name == "GoToDoorEnv":
        aux[0], aux[1] = int(env.target_pos[0]), int(env.target_pos[1])
        mission[0] = _COLOR_IDX[env.target_color]
    elif name == "GoToObjectEnv":
        aux[0], aux[1] = int(env.target_pos[0]), int(env.target_pos[1])
    elif name == "PutNearEnv":
        aux[0] = _TYPE_IDX[env.move_type]
        aux[1] = _COLOR_IDX[env.moveColor]
        aux[2], aux[3] = int(env.target_pos[0]), int(env.target_pos[1])
    elif name == "RedBlueDoorEnv":
        size = env.size
        for y in range(env.height):
            cell = env.grid.get(size // 2, y)
            if cell is not None and cell.type == "door":
                aux[0], aux[1] = size // 2, y
            cell = env.grid.get(size // 2 + size - 1, y)
            if cell is not None and cell.type == "door":
                aux[2], aux[3] = size // 2 + size - 1, y
    elif name == "MemoryEnv":
        aux[0], aux[1] = int(env.success_pos[0]), int(env.success_pos[1])
        aux[2], aux[3] = int(env.failure_pos[0]), int(env.failure_pos[1])
    elif name == "DynamicObstaclesEnv":
        for i, ob in enumerate(env.obstacles):
            aux[2 * i] = int(ob.cur_pos[0])
            aux[2 * i + 1] = int(ob.cur_pos[1])
    elif name == "UnlockEnv":
        aux[0] = int(env.door.cur_pos[0])
        aux[1] = int(env.door.cur_pos[1])
    elif name in (
        "KeyCorridorEnv",
        "UnlockPickupEnv",
        "BlockedUnlockPickupEnv",
        "ObstructedMaze_1Dlhb",
        "ObstructedMaze_Full",
        "ObstructedMaze_2Dl",
        "ObstructedMaze_2Dlh",
        "ObstructedMaze_2Dlhb",
    ):
        aux[0] = _TYPE_IDX[env.obj.type]
        aux[1] = _COLOR_IDX[env.obj.color]

    return state.replace(
        aux=jnp.asarray(aux), mission=jnp.asarray(mission)
    )


def babyai_from_reference(ref_env, state: EnvState) -> EnvState:
    """Snapshot a reference ``RoomGridLevel``'s instruction tree + verifier
    identity sets into mission codes, mark planes and verifier aux slots
    (see envs/babyai/core.py for the layout)."""
    from minigrid.envs.babyai.core import verifier as V

    from minigrid_dynamicprogramming_tpu.envs.babyai import core as B

    env = ref_env.unwrapped
    instrs = env.instrs

    _LOC = {None: 0, "left": 1, "right": 2, "front": 3, "behind": 4}
    _TYPE = {None: 0, "door": 4, "key": 5, "ball": 6, "box": 7}

    h, w = state.grid_obj.shape
    marks = np.zeros((h, w), dtype=np.uint16)
    codes = np.zeros((MISSION_SLOTS,), dtype=np.int32)

    def encode_desc(desc, c, l, d):
        base = B._desc_base(c, l, d)
        codes[base] = _TYPE[desc.type]
        codes[base + 1] = 6 if desc.color is None else _COLOR_IDX[desc.color]
        codes[base + 2] = _LOC[desc.loc]
        codes[base + 3] = int(len(desc.obj_set) > 1)
        bit = B.desc_bit(c, l, d)
        # Positions come from the verifier's own scan (obj_poss is parallel
        # to obj_set, verifier.py:115-167) — cur_pos is None for wall cells
        # matched by type-less descriptors and is not what verify() uses.
        for obj, pos in zip(desc.obj_set, desc.obj_poss):
            x, y = int(pos[0]), int(pos[1])
            if x >= 0 and y >= 0:
                marks[y, x] |= bit

    def encode_leaf(instr, c, l):
        base = B._leaf_base(c, l)
        if isinstance(instr, V.GoToInstr):
            codes[base] = B.KIND_GOTO
            encode_desc(instr.desc, c, l, 0)
        elif isinstance(instr, V.OpenInstr):
            codes[base] = B.KIND_OPEN
            codes[base + 1] = int(instr.strict)
            encode_desc(instr.desc, c, l, 0)
        elif isinstance(instr, V.PickupInstr):
            codes[base] = B.KIND_PICKUP
            codes[base + 1] = int(instr.strict)
            encode_desc(instr.desc, c, l, 0)
        elif isinstance(instr, V.PutNextInstr):
            codes[base] = B.KIND_PUTNEXT
            codes[base + 1] = int(instr.strict)
            encode_desc(instr.desc_move, c, l, 0)
            encode_desc(instr.desc_fixed, c, l, 1)
        else:
            raise NotImplementedError(type(instr))

    def encode_clause(instr, c):
        if isinstance(instr, V.AndInstr):
            codes[B.CLAUSE_OFF[c]] = 1
            encode_leaf(instr.instr_a, c, 0)
            encode_leaf(instr.instr_b, c, 1)
        else:
            encode_leaf(instr, c, 0)

    if isinstance(instrs, V.BeforeInstr):
        codes[0] = B.COMB_BEFORE
        codes[1] = int(instrs.strict)
        encode_clause(instrs.instr_a, 0)
        encode_clause(instrs.instr_b, 1)
    elif isinstance(instrs, V.AfterInstr):
        codes[0] = B.COMB_AFTER
        codes[1] = int(instrs.strict)
        encode_clause(instrs.instr_a, 0)
        encode_clause(instrs.instr_b, 1)
    else:
        codes[0] = B.COMB_SINGLE
        encode_clause(instrs, 0)

    aux = np.asarray(state.aux).copy()
    aux[B.AUX_A_DONE] = 0
    aux[B.AUX_B_DONE] = 0
    for i in range(4):
        aux[B.AUX_LEAF_DONE + i] = 0
        aux[B.AUX_PC_NONE + i] = 1
    aux[B.AUX_MAX_STEPS] = int(env.max_steps)

    # Identity bits for a carried tracked object (PutNext start_carrying):
    # walk the same slot layout as encode and check obj_set membership.
    carrying_marks = 0
    if env.carrying is not None:
        def leaf_at(c, l):
            node = instrs
            if isinstance(node, (V.BeforeInstr, V.AfterInstr)):
                node = node.instr_a if c == 0 else node.instr_b
            elif c == 1:
                return None
            if isinstance(node, V.AndInstr):
                node = node.instr_a if l == 0 else node.instr_b
            elif l == 1:
                return None
            return node

        for c in range(2):
            for l in range(2):
                node = leaf_at(c, l)
                if node is None:
                    continue
                for d, desc in enumerate(
                    (getattr(node, "desc_move", getattr(node, "desc", None)),
                     getattr(node, "desc_fixed", None))
                ):
                    if desc is None:
                        continue
                    if any(env.carrying is o for o in desc.obj_set):
                        carrying_marks |= B.desc_bit(c, l, d)

    return state.replace(
        marks=jnp.asarray(marks),
        vmarks=jnp.asarray(marks),
        carrying_marks=jnp.asarray(carrying_marks, dtype=jnp.uint16),
        mission=jnp.asarray(codes),
        aux=jnp.asarray(aux),
    )
