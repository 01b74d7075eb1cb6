"""Exact DP over two-key chain tasks: (key1-loc, key2-loc, doors, pose).

``dp/tabular_obstructed.py`` tracks one key (bare or box-hidden) plus one
movable ball.  The remaining reference sub-family outside every exact
domain so far is the **two-key chain**: unlock door A with key A to reach
key B, which unlocks door B to the objective —

* BabyAI **UnlockToUnlock**
  (`/root/reference/minigrid/envs/babyai/unlock.py:395-471`): key A in the
  right room, door A (color A) between left and middle, key B in the middle
  room, door B (color B) between middle and right, target ball in the left
  room; the agent starts in the middle.
* **ObstructedMaze-2Q/Full** inter-quadrant sub-problems
  (`/root/reference/minigrid/envs/obstructedmaze.py:206-258`): each
  quadrant's door key may sit behind another quadrant's locked door, giving
  key->door->key chains (the intra-quadrant box/blocker sub-problems are the
  existing obstructed domain).

State space::

    (k1, k2, door-config, dir, y, x)

with ``k_i in {cell 0..HW-1, CARRIED=HW, IN_BOX=HW+1}``.  Key identity is
**by color** (the reference draws two distinct colors,
unlock.py:442-466); each key unlocks exactly the doors of its color, so
the layout carries a per-key ``door_unlockable`` mask.  The single carry
slot is shared (pickup needs empty hands,
`/root/reference/minigrid/minigrid_env.py:556-561`), so both-carried
states are unreachable.  Every backup is a structured
shift/select/take_along_axis over the factored (K1, K2, Cd, 4, H, W)
value tensor — same design as dp/tabular_obstructed.py — so XLA
vectorizes it across a layout batch under vmap.

Scope: two keys of distinct colors (each bare or hidden in its own box),
any number of doors up to ``max_doors``, one pickup-terminal target or a
goal cell; no movable blocker ball (compose with the obstructed domain for
the ``b`` variants).  Not modeled, as in the obstructed domain: carrying a
box and re-closing doors (only ever action-wasteful here; BFS-verified in
tests/test_dp_twokey.py).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from minigrid_dynamicprogramming_tpu.core.constants import (
    OBJ_BOX,
    OBJ_DOOR,
    OBJ_EMPTY,
    OBJ_FLOOR,
    OBJ_GOAL,
    OBJ_KEY,
    OBJ_LAVA,
    STATE_LOCKED,
    STATE_OPEN,
)
from minigrid_dynamicprogramming_tpu.core.state import EnvState
from minigrid_dynamicprogramming_tpu.dp.tabular_key import (
    _DIRS,
    _front_index,
    _shift_from,
)

__all__ = [
    "TwoKeyLayout",
    "extract_twokey_layout",
    "twokey_value_iteration",
    "twokey_state_index",
    "twokey_greedy_action",
    "twokey_state_value",
    "twokey_steps_to_go",
]


class TwoKeyLayout(NamedTuple):
    """Static per-layout data; vmap over layouts.

    ``K = H*W + 2`` locations per key (cell, CARRIED=H*W, IN_BOX=H*W+1);
    ``Cd = 2^D`` door configs (bit d = door d has been opened)."""

    base_walk: jnp.ndarray  # (H, W) bool — walkable ignoring doors/keys
    base_empty: jnp.ndarray  # (H, W) bool — may become a drop target
    goal: jnp.ndarray  # (H, W) bool
    lava: jnp.ndarray  # (H, W) bool
    target_pos: jnp.ndarray  # (2,) int32 (x, y); (-1,-1) = goal objective
    door_pos: jnp.ndarray  # (D, 2) int32; (-1,-1) = unused slot
    door_id: jnp.ndarray  # (H, W) int32; -1 where no door
    door_init: jnp.ndarray  # (D,) int32 — grid door state at t=0
    door_unlockable: jnp.ndarray  # (2, D) bool — per key
    key_color: jnp.ndarray  # (2,) int32 — key identity (distinct colors)
    box_idx: jnp.ndarray  # (2,) int32 — per-key box raster cell, -1 none
    key0: jnp.ndarray  # (2,) int32 — initial key locs (incl. IN_BOX), -1 none

    @property
    def n_doors(self) -> int:
        return self.door_pos.shape[-2]


def _first_flat(mask_flat: jnp.ndarray, hw: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(index, found) of the first True in raster order."""
    flat = jnp.arange(hw, dtype=jnp.int32)
    idx = jnp.argmin(jnp.where(mask_flat, flat, hw)).astype(jnp.int32)
    return idx, mask_flat[idx]


def extract_twokey_layout(
    state: EnvState,
    max_doors: int = 2,
    target_type: jnp.ndarray | int = -1,
    target_color: jnp.ndarray | int = -1,
) -> TwoKeyLayout:
    """Derive the two-key DP layout from an :class:`EnvState`.

    Key sources (bare grid keys and key-hiding boxes) are enumerated in
    raster order; the first two become key slots 0 and 1, identified by
    color from then on.  A carried key at extraction time claims the slot
    matching ``state.carrying_color``."""
    obj = state.grid_obj
    h, w = obj.shape
    hw = h * w
    flat = jnp.arange(hw, dtype=jnp.int32)
    t_type = jnp.asarray(target_type, jnp.int32)
    t_color = jnp.asarray(target_color, jnp.int32)

    is_target = (
        (obj.astype(jnp.int32) == t_type)
        & (state.grid_color.astype(jnp.int32) == t_color)
        & (t_type >= 0)
    )
    tidx, has_target = _first_flat(is_target.ravel(), hw)
    target_pos = jnp.where(
        has_target,
        jnp.stack([tidx % w, tidx // w]).astype(jnp.int32),
        jnp.array([-1, -1], dtype=jnp.int32),
    )
    ys = jnp.arange(h, dtype=jnp.int32)[:, None]
    xs = jnp.arange(w, dtype=jnp.int32)[None, :]
    target_cell = (xs == target_pos[0]) & (ys == target_pos[1])

    is_door = obj == OBJ_DOOR
    is_key = obj == OBJ_KEY
    is_keybox = (obj == OBJ_BOX) & (state.contains_obj == OBJ_KEY)

    base_walk = (
        (obj == OBJ_EMPTY)
        | (obj == OBJ_FLOOR)
        | (obj == OBJ_GOAL)
        | (obj == OBJ_LAVA)
        | is_key
        | is_keybox
        | is_door
    ) & ~target_cell
    base_empty = (obj == OBJ_EMPTY) | is_key | is_keybox

    # Door slots in raster order (same scheme as tabular_obstructed).
    door_rank = jnp.where(is_door.ravel(), flat, hw)
    order = jnp.argsort(door_rank)
    slots = order[:max_doors]
    slot_valid = is_door.ravel()[slots]
    dx = (slots % w).astype(jnp.int32)
    dy = (slots // w).astype(jnp.int32)
    door_pos = jnp.stack(
        [jnp.where(slot_valid, dx, -1), jnp.where(slot_valid, dy, -1)], axis=-1
    )
    door_id = jnp.full((hw,), -1, dtype=jnp.int32)
    for i in range(max_doors):
        door_id = jnp.where(
            (flat == slots[i]) & slot_valid[i], jnp.int32(i), door_id
        )
    door_id = door_id.reshape(h, w)
    overflow = is_door & (door_id < 0)
    base_walk = base_walk & ~(overflow & (state.grid_state != STATE_OPEN))

    door_init = state.grid_state[
        jnp.clip(door_pos[:, 1], 0, h - 1), jnp.clip(door_pos[:, 0], 0, w - 1)
    ].astype(jnp.int32)
    door_init = jnp.where(slot_valid, door_init, STATE_OPEN)
    door_color = state.grid_color[
        jnp.clip(door_pos[:, 1], 0, h - 1), jnp.clip(door_pos[:, 0], 0, w - 1)
    ].astype(jnp.int32)

    # Key sources in raster order: bare keys and key-boxes interleaved by
    # cell index (a cell holds at most one of them).
    src = is_key.ravel() | is_keybox.ravel()
    i1, has1 = _first_flat(src, hw)
    src2 = src & (flat > i1)
    i2, has2 = _first_flat(src2, hw)
    carrying_key = state.carrying_obj == OBJ_KEY

    def _slot(idx, has):
        boxed = is_keybox.ravel()[idx] & has
        loc = jnp.where(has, jnp.where(boxed, hw + 1, idx), -1)
        color = jnp.where(
            boxed,
            state.contains_color.ravel()[idx].astype(jnp.int32),
            state.grid_color.ravel()[idx].astype(jnp.int32),
        )
        color = jnp.where(has, color, -1)
        bidx = jnp.where(boxed, idx, -1).astype(jnp.int32)
        return loc.astype(jnp.int32), color, bidx

    loc1, color1, box1 = _slot(i1, has1)
    loc2, color2, box2 = _slot(i2, has2)
    # A carried key fills the first empty slot (by construction at most one
    # key can be carried; its color comes from the carry registers).
    carried_fills_2 = carrying_key & has1 & ~has2
    loc2 = jnp.where(carried_fills_2, hw, loc2)
    color2 = jnp.where(
        carried_fills_2, state.carrying_color.astype(jnp.int32), color2
    )
    carried_fills_1 = carrying_key & ~has1
    loc1 = jnp.where(carried_fills_1, hw, loc1)
    color1 = jnp.where(
        carried_fills_1, state.carrying_color.astype(jnp.int32), color1
    )

    key_color = jnp.stack([color1, color2])
    unlockable = slot_valid[None, :] & (
        door_color[None, :] == key_color[:, None]
    ) & (key_color[:, None] >= 0)

    return TwoKeyLayout(
        base_walk=base_walk,
        base_empty=base_empty,
        goal=obj == OBJ_GOAL,
        lava=obj == OBJ_LAVA,
        target_pos=target_pos,
        door_pos=door_pos,
        door_id=door_id,
        door_init=door_init,
        door_unlockable=unlockable,
        key_color=key_color,
        box_idx=jnp.stack([box1, box2]),
        key0=jnp.stack([loc1, loc2]),
    )


def _door_tables(layout: TwoKeyLayout):
    """Per-(config, cell) door tables — same contract as tabular_obstructed."""
    D = layout.n_doors
    Cd = 1 << D
    cfg = jnp.arange(Cd, dtype=jnp.int32)
    h, w = layout.base_walk.shape

    did = layout.door_id
    safe = jnp.clip(did, 0, D - 1)
    opened_bit = (cfg[:, None] >> safe.ravel()[None, :]) & 1
    opened_bit = opened_bit.reshape(Cd, h, w)
    init_cell = layout.door_init[safe]
    is_door_cell = did >= 0

    open_cell = is_door_cell[None] & (
        (opened_bit == 1) | (init_cell == STATE_OPEN)[None]
    )
    locked_cell = (
        is_door_cell[None]
        & (opened_bit == 0)
        & (init_cell == STATE_LOCKED)[None]
    )
    closed_cell = is_door_cell[None] & ~open_cell & ~locked_cell
    door_block = is_door_cell[None] & ~open_cell
    bitmask = jnp.where(is_door_cell, 1 << safe, 0)
    return door_block, bitmask, locked_cell, closed_cell


def _backup(v: jnp.ndarray, layout: TwoKeyLayout, gamma: float):
    """One Bellman backup: (K1, K2, Cd, 4, H, W) -> q: (A, ...same...).

    Action order = the reference Actions enum (left, right, forward,
    pickup, drop, toggle, done)."""
    K1, K2, Cd, _, h, w = v.shape
    hw = h * w
    CARRIED = hw
    IN_BOX = hw + 1
    k1loc = jnp.arange(K1, dtype=jnp.int32)
    k2loc = jnp.arange(K2, dtype=jnp.int32)

    door_block, bitmask, locked_cell, closed_cell = _door_tables(layout)

    ys = jnp.arange(h, dtype=jnp.int32)[:, None]
    xs = jnp.arange(w, dtype=jnp.int32)[None, :]
    cell_idx = (ys * w + xs).astype(jnp.int32)
    box1_cell = cell_idx == layout.box_idx[0]
    box2_cell = cell_idx == layout.box_idx[1]

    # Occupancy by each tracked key, per axis value: the key blocks its
    # cell when bare on the grid, and its box blocks while it is inside.
    key1_block = (k1loc[:, None, None] == cell_idx[None]) | (
        (k1loc == IN_BOX)[:, None, None] & box1_cell[None]
    )  # (K1, H, W)
    key2_block = (k2loc[:, None, None] == cell_idx[None]) | (
        (k2loc == IN_BOX)[:, None, None] & box2_cell[None]
    )  # (K2, H, W)

    # walk: (K1, K2, Cd, H, W)
    walk = (
        layout.base_walk[None, None, None]
        & ~door_block[None, None]
        & ~key1_block[:, None, None]
        & ~key2_block[None, :, None]
    )

    q_left = gamma * jnp.roll(v, 1, axis=3)
    q_right = gamma * jnp.roll(v, -1, axis=3)

    target_cell = (xs == layout.target_pos[0]) & (ys == layout.target_pos[1])
    empty_hands = (k1loc != CARRIED)[:, None] & (k2loc != CARRIED)[None]

    safe_id = jnp.clip(layout.door_id, 0, layout.n_doors - 1)
    unlock1_cell = locked_cell & layout.door_unlockable[0][safe_id][None]
    unlock2_cell = locked_cell & layout.door_unlockable[1][safe_id][None]

    q_fwd, q_pick, q_drop, q_tog = [], [], [], []
    for d, dxy in enumerate(_DIRS):
        vd = v[:, :, :, d]  # (K1, K2, Cd, H, W)
        fidx = _front_index(h, w, dxy)  # (H, W), -1 if OOB

        # forward (minigrid_env.py:546-553)
        vn = _shift_from(vd, dxy)
        walk_n = _shift_from(walk, dxy)
        goal_n = _shift_from(layout.goal.astype(v.dtype), dxy)
        lava_n = _shift_from(layout.lava.astype(v.dtype), dxy)
        qd = gamma * jnp.where(walk_n, vn, vd)
        qd = jnp.where(lava_n > 0, 0.0, qd)
        qd = jnp.where(goal_n > 0, 1.0, qd)
        q_fwd.append(qd)

        # pickup (minigrid_env.py:556-561): needs empty hands; in reachable
        # states the front cell holds at most one of {key1, key2, target}.
        key1_front = (k1loc[:, None, None] == fidx[None]) & (fidx >= 0)[None]
        key2_front = (k2loc[:, None, None] == fidx[None]) & (fidx >= 0)[None]
        eh = empty_hands[:, :, None, None, None]  # (K1, K2, 1, 1, 1)
        v_k1_carried = vd[CARRIED][None]  # (1, K2, Cd, H, W)
        qp = jnp.where(
            key1_front[:, None, None] & eh, gamma * v_k1_carried, gamma * vd
        )
        v_k2_carried = vd[:, CARRIED][:, None]  # (K1, 1, Cd, H, W)
        qp = jnp.where(
            key2_front[None, :, None] & eh, gamma * v_k2_carried, qp
        )
        target_front = _shift_from(target_cell.astype(jnp.int32), dxy).astype(
            bool
        )
        qp = jnp.where(target_front[None, None, None] & eh, 1.0, qp)
        q_pick.append(qp)

        # drop (minigrid_env.py:564-568): front cell must be empty in the
        # current (k1, k2) state; only the carried slices change.
        front_ok = _shift_from(layout.base_empty, dxy) & (fidx >= 0)
        key1_at_f = (k1loc[:, None, None] == fidx[None]) | (
            (k1loc == IN_BOX)[:, None, None]
            & (fidx == layout.box_idx[0])[None]
            & (layout.box_idx[0] >= 0)
        )  # (K1, H, W)
        key2_at_f = (k2loc[:, None, None] == fidx[None]) | (
            (k2loc == IN_BOX)[:, None, None]
            & (fidx == layout.box_idx[1])[None]
            & (layout.box_idx[1] >= 0)
        )  # (K2, H, W)
        droppable = (
            front_ok[None, None, None]
            & ~key1_at_f[:, None, None]
            & ~key2_at_f[None, :, None]
        )  # (K1, K2, H, W) broadcast over Cd
        idx = jnp.clip(fidx, 0, hw - 1)
        v_k1_drop = jnp.take_along_axis(
            vd,
            jnp.broadcast_to(idx[None, None, None], (1, K2, Cd, h, w)),
            axis=0,
        )  # (1, K2, Cd, H, W)
        k1_carried = (k1loc == CARRIED)[:, None, None, None, None]
        qdrop = jnp.where(
            k1_carried & droppable, gamma * v_k1_drop, gamma * vd
        )
        v_k2_drop = jnp.take_along_axis(
            vd,
            jnp.broadcast_to(idx[None, None, None], (K1, 1, Cd, h, w)),
            axis=1,
        )  # (K1, 1, Cd, H, W)
        k2_carried = (k2loc == CARRIED)[None, :, None, None, None]
        qdrop = jnp.where(
            k2_carried & ~k1_carried & droppable, gamma * v_k2_drop, qdrop
        )
        q_drop.append(qdrop)

        # toggle (world_object.py:185-195, :291-294): doors and the boxes.
        closed_n = _shift_from(closed_cell, dxy)  # (Cd, H, W)
        unlock1_n = _shift_from(unlock1_cell, dxy)
        unlock2_n = _shift_from(unlock2_cell, dxy)
        bit_n = _shift_from(bitmask, dxy)  # (H, W)
        allowed = (
            closed_n[None, None]
            | (
                unlock1_n[None, None]
                & (k1loc == CARRIED)[:, None, None, None, None]
            )
            | (
                unlock2_n[None, None]
                & (k2loc == CARRIED)[None, :, None, None, None]
            )
        )  # (K1, K2, Cd, H, W)
        cfg = jnp.arange(Cd, dtype=jnp.int32)
        new_cfg = cfg[:, None, None] | bit_n[None]  # (Cd, H, W)
        v_open = jnp.take_along_axis(
            vd,
            jnp.broadcast_to(new_cfg[None, None], (K1, K2, Cd, h, w)),
            axis=2,
        )
        qt = gamma * jnp.where(allowed, v_open, vd)
        # box toggles: facing box_i while key_i is inside reveals key_i at
        # the box cell (toggle has no empty-hand precondition).
        box1_front = (fidx == layout.box_idx[0]) & (layout.box_idx[0] >= 0)
        v_k1_revealed = jnp.take_along_axis(
            vd,
            jnp.broadcast_to(
                jnp.clip(layout.box_idx[0], 0, hw - 1)[
                    None, None, None, None, None
                ],
                (1, K2, Cd, h, w),
            ),
            axis=0,
        )
        k1_in_box = (k1loc == IN_BOX)[:, None, None, None, None]
        qt = jnp.where(
            k1_in_box & box1_front[None, None, None],
            gamma * v_k1_revealed,
            qt,
        )
        box2_front = (fidx == layout.box_idx[1]) & (layout.box_idx[1] >= 0)
        v_k2_revealed = jnp.take_along_axis(
            vd,
            jnp.broadcast_to(
                jnp.clip(layout.box_idx[1], 0, hw - 1)[
                    None, None, None, None, None
                ],
                (K1, 1, Cd, h, w),
            ),
            axis=1,
        )
        k2_in_box = (k2loc == IN_BOX)[None, :, None, None, None]
        qt = jnp.where(
            k2_in_box & box2_front[None, None, None],
            gamma * v_k2_revealed,
            qt,
        )
        q_tog.append(qt)

    q_fwd = jnp.stack(q_fwd, axis=3)
    q_pick = jnp.stack(q_pick, axis=3)
    q_drop = jnp.stack(q_drop, axis=3)
    q_tog = jnp.stack(q_tog, axis=3)
    q_stay = gamma * v

    return jnp.stack([q_left, q_right, q_fwd, q_pick, q_drop, q_tog, q_stay])


@partial(jax.jit, static_argnames=("gamma", "n_sweeps"))
def twokey_value_iteration(
    layout: TwoKeyLayout,
    gamma: float = 0.995,
    n_sweeps: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact VI over the two-key domain.

    Returns (V: (K1, K2, Cd, 4, H, W) f32, policy: same shape int8); vmap
    over a layout batch."""
    h, w = layout.base_walk.shape
    K = h * w + 2
    Cd = 1 << layout.n_doors
    v0 = jnp.zeros((K, K, Cd, 4, h, w), dtype=jnp.float32)

    def sweep(v, _):
        return jnp.max(_backup(v, layout, gamma), axis=0), None

    v, _ = jax.lax.scan(sweep, v0, None, length=n_sweeps)
    policy = jnp.argmax(_backup(v, layout, gamma), axis=0).astype(jnp.int8)
    return v, policy


def twokey_state_index(layout: TwoKeyLayout, state: EnvState):
    """(k1, k2, cfg, dir, y, x) of an env state under this layout.

    Keys are matched BY COLOR against ``layout.key_color`` (bare on the
    grid, inside their box, or carried)."""
    h, w = layout.base_walk.shape
    hw = h * w
    D = layout.n_doors
    obj = state.grid_obj
    flat = jnp.arange(hw, dtype=jnp.int32)

    def _loc(slot):
        color = layout.key_color[slot]
        bare = (
            (obj == OBJ_KEY) & (state.grid_color.astype(jnp.int32) == color)
        ).ravel()
        kidx = jnp.argmin(jnp.where(bare, flat, hw)).astype(jnp.int32)
        boxed = (
            (obj == OBJ_BOX)
            & (state.contains_obj == OBJ_KEY)
            & (state.contains_color.astype(jnp.int32) == color)
        ).any()
        carried = (state.carrying_obj == OBJ_KEY) & (
            state.carrying_color.astype(jnp.int32) == color
        )
        return jnp.where(
            bare[kidx],
            kidx,
            jnp.where(boxed, hw + 1, jnp.where(carried, hw, -1)),
        )

    k1 = _loc(0)
    k2 = _loc(1)

    sigma = state.grid_state[
        jnp.clip(layout.door_pos[:, 1], 0, h - 1),
        jnp.clip(layout.door_pos[:, 0], 0, w - 1),
    ].astype(jnp.int32)
    opened = (sigma == STATE_OPEN) & (layout.door_init != STATE_OPEN)
    opened = opened & (layout.door_pos[:, 0] >= 0)
    cfg = jnp.sum(opened.astype(jnp.int32) << jnp.arange(D, dtype=jnp.int32))
    return k1, k2, cfg, state.agent_dir, state.agent_pos[1], state.agent_pos[0]


def twokey_greedy_action(
    policy: jnp.ndarray, layout: TwoKeyLayout, state: EnvState
) -> jnp.ndarray:
    k1, k2, c, d, y, x = twokey_state_index(layout, state)
    return policy[k1, k2, c, d, y, x].astype(jnp.int32)


def twokey_state_value(v: jnp.ndarray, layout: TwoKeyLayout, state: EnvState):
    k1, k2, c, d, y, x = twokey_state_index(layout, state)
    return v[k1, k2, c, d, y, x]


def twokey_steps_to_go(v: jnp.ndarray, gamma: float) -> jnp.ndarray:
    d = 1.0 + jnp.log(jnp.maximum(v, 1e-30)) / math.log(gamma)
    return jnp.where(v > 0, jnp.round(d), jnp.inf)
