"""Pallas TPU kernel for batched value iteration.

The XLA path (:func:`..tabular.value_iteration`) materializes V to HBM after
every Bellman sweep; for the tiny per-layout state spaces here (DoorKey-8x8:
S = 1536 states) that makes VI bandwidth-bound.  This kernel keeps the whole
value tensor **resident in VMEM across all sweeps** and lays the layout batch
along the 128-lane axis, so each sweep is pure VPU work on fully-utilized
registers with zero HBM traffic:

    V layout:  (C, 4, H*W, B_tile)   — batch on lanes, positions on sublanes
    left/right -> static dir-slab reindexing
    forward    -> sublane roll by -(dy*W + dx)  (border wrap masked by walls)
    pickup     -> carry-bit slab flip
    toggle     -> sum over C target slabs weighted by a (C, C, B) select
                  table (C is tiny, so the gather becomes 6 multiply-adds)

All per-layout structure (walkability per config, goal/lava/key/door front
masks, the toggle-transition table) is precomputed once with XLA and streamed
in as dense mask tensors; the sweep loop runs entirely on-chip.

Supports one key + up to ``max_doors`` doors like the XLA path, but the mask
tensors grow as 3^D — intended for the D <= 2 env families (DoorKey, Unlock,
LavaGap, Crossing, Empty, FourRooms...).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minigrid_dynamicprogramming_tpu.dp.tabular import (
    TabularLayout,
    _cfg_tables,
    _num_cfg,
    _shift_from,
    _DIRS,
)

__all__ = ["pallas_value_iteration"]

LANES = 128


def _build_masks(layout: TabularLayout):
    """Per-layout mask planes in (.., H, W) layout (vmapped over B later).

    Returns walk_n (4, C, H, W), goal_n/lava_n/key_front/door_front
    (4, H, W), tsel (C, C) — all f32.
    """
    walk, toggle_cfg, carry = _cfg_tables(layout)
    C = walk.shape[0]
    h, w = layout.base_walk.shape
    f32 = jnp.float32

    walk_n, goal_n, lava_n, key_f, door_f = [], [], [], [], []
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    for dx, dy in _DIRS:
        walk_n.append(_shift_from(walk.astype(f32), (dx, dy)))
        goal_n.append(_shift_from(layout.goal.astype(f32), (dx, dy)))
        lava_n.append(_shift_from(layout.lava.astype(f32), (dx, dy)))
        key_f.append(
            ((xs + dx == layout.key_pos[0]) & (ys + dy == layout.key_pos[1]))
            .astype(f32)
        )
        door_f.append((_shift_from(layout.door_id + 1, (dx, dy)) > 0).astype(f32))

    # tsel[c, c'] = 1 iff toggling the front door moves config c -> c'.
    # With a single flat table the per-cell door identity is lost; restrict
    # to layouts where every in-budget door reachable from a cell determines
    # the slot via door_front masks per slot.  For D slots we build the
    # transition for the door actually faced by summing per-slot masks at
    # kernel level; to keep the kernel simple we assume at most one door is
    # adjacent to any cell per direction (true for the supported families)
    # and use the per-cell slot id to pick the row.
    D = layout.n_doors
    cfg = jnp.arange(C)
    tsel = []
    for k in range(D):
        tgt = toggle_cfg[:, k]  # (C,)
        tsel.append(jax.nn.one_hot(tgt, C, dtype=f32))  # (C, C')
    tsel = jnp.stack(tsel)  # (D, C, C')

    # door slot id at the front cell per dir: (4, H, W) in [0, D), 0 if none
    slot_f = []
    for dx, dy in _DIRS:
        fid = _shift_from(layout.door_id + 1, (dx, dy)) - 1
        slot_f.append(jnp.clip(fid, 0, D - 1))
    slot_f = jnp.stack(slot_f).astype(jnp.int32)  # (4, H, W)

    # Pre-resolve the per-cell toggle table: tmask[c, c', 4, H, W] =
    # tsel[slot_f, c, c'] where a door is faced.  For D small this is the
    # clean dense form the kernel consumes.
    tmask = tsel[slot_f]  # (4, H, W, C, C')
    tmask = jnp.moveaxis(tmask, (3, 4), (0, 1))  # (C, C', 4, H, W)

    return (
        jnp.stack(walk_n, 0).reshape(4, C, h * w),
        jnp.stack(goal_n, 0).reshape(4, h * w),
        jnp.stack(lava_n, 0).reshape(4, h * w),
        jnp.stack(key_f, 0).reshape(4, h * w),
        jnp.stack(door_f, 0).reshape(4, h * w),
        tmask.reshape(C, C, 4, h * w),
    )


def _vi_kernel(
    walk_ref, goal_ref, lava_ref, keyf_ref, doorf_ref, tmask_ref,
    vout_ref, v_s, v_n, *, C, W, HW, gamma, n_sweeps,
):
    f32 = jnp.float32
    v_s[:] = jnp.zeros_like(v_s)

    # pltpu.roll requires non-negative shifts; rolls are cyclic so take mod.
    shifts = [(-(dy * W + dx)) % HW for dx, dy in _DIRS]

    def sweep(_, carry=None):
        for c in range(C):
            for d in range(4):
                v_cd = v_s[c, d]
                # left / right (dir rolls are static slab picks).
                q = jnp.maximum(v_s[c, (d - 1) % 4], v_s[c, (d + 1) % 4])
                # forward.
                vn = pltpu.roll(v_cd, shifts[d], axis=0)
                moved = jnp.where(walk_ref[d, c] > 0, vn, v_cd)
                qf = jnp.where(lava_ref[d] > 0, 0.0, moved)
                q = jnp.maximum(q, qf)
                # pickup (carry-bit flip; only from carry == 0 slabs).
                if c % 2 == 0:
                    q = jnp.maximum(
                        q, jnp.where(keyf_ref[d] > 0, v_s[c + 1, d], v_cd)
                    )
                # toggle: target-config mix where facing a door.
                tv = tmask_ref[c, 0, d] * v_s[0, d]
                for c2 in range(1, C):
                    tv += tmask_ref[c, c2, d] * v_s[c2, d]
                q = jnp.maximum(q, jnp.where(doorf_ref[d] > 0, tv, v_cd))
                # stay (drop/done/no-op).
                q = jnp.maximum(q, v_cd)
                # one discounted step, then the goal terminal overrides
                # (reward 1 regardless of V at the goal cell).
                q = gamma * q
                q = jnp.where(goal_ref[d] * walk_ref[d, c] > 0, 1.0, q)
                v_n[c, d] = q
        v_s[:] = v_n[:]
        return carry

    jax.lax.fori_loop(0, n_sweeps, sweep, None)
    vout_ref[:] = v_s[:]


@partial(jax.jit, static_argnames=("gamma", "n_sweeps"))
def pallas_value_iteration(
    layouts: TabularLayout, gamma: float = 0.995, n_sweeps: int = 256
):
    """Batched VI on TPU via the VMEM-resident Pallas kernel.

    ``layouts`` has a leading batch axis B (pad to a multiple of 128 for
    full lane utilization).  Returns V with shape (B, C, 4, H, W), equal to
    ``vmap(value_iteration)`` up to float associativity.
    """
    B = layouts.base_walk.shape[0]
    h, w = layouts.base_walk.shape[1:]
    HW = h * w
    D = layouts.door_pos.shape[-2]
    C = _num_cfg(D)

    walk, goal, lava, keyf, doorf, tmask = jax.vmap(_build_masks)(layouts)
    # Move batch to the last (lane) axis.
    to_lanes = lambda x: jnp.moveaxis(x, 0, -1)
    walk, goal, lava, keyf, doorf, tmask = map(
        to_lanes, (walk, goal, lava, keyf, doorf, tmask)
    )

    pad = (-B) % LANES
    if pad:
        padf = lambda x: jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        walk, goal, lava, keyf, doorf, tmask = map(
            padf, (walk, goal, lava, keyf, doorf, tmask)
        )
    Bp = B + pad

    grid = (Bp // LANES,)

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape + (LANES,),
            lambda i: (0,) * nd + (i,),
            memory_space=pltpu.VMEM,
        )

    kernel = partial(
        _vi_kernel, C=C, W=w, HW=HW, gamma=gamma, n_sweeps=n_sweeps
    )
    v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec((4, C, HW)),
            spec((4, HW)),
            spec((4, HW)),
            spec((4, HW)),
            spec((4, HW)),
            spec((C, C, 4, HW)),
        ],
        out_specs=spec((C, 4, HW)),
        out_shape=jax.ShapeDtypeStruct((C, 4, HW, Bp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, 4, HW, LANES), jnp.float32),
            pltpu.VMEM((C, 4, HW, LANES), jnp.float32),
        ],
    )(walk, goal, lava, keyf, doorf, tmask)

    v = jnp.moveaxis(v, -1, 0)[:B]  # (B, C, 4, HW)
    return v.reshape(B, C, 4, h, w)


# ---------------------------------------------------------------------------
# Key-position domain (dp/tabular_key.py) — VMEM-resident Pallas VI.
#
# V layout per layout-instance: (C, 4, K, L) with the H*W raster on the
# 128-LANE axis (padded; P = 128 // HW layouts share one block when the
# grid is small, e.g. two DoorKey-8x8 layouts per block) and the key-loc
# axis K = H*W + 1 on sublanes.  Every transition is a lane roll, a slab
# select, or a sublane-axis reduction:
#
#   forward -> lane roll by -(dy*W + dx); cross-layout wrap is masked by
#              the border walls baked into the walk masks
#   pickup  -> select the CARRIED sublane row where facing the key
#   drop    -> key-loc jumps CARRIED -> front(cell): a diagonal gather,
#              computed as (V * dropsel).sum(sublanes) with a precomputed
#              one-hot (K, L) diagonal mask
#   toggle  -> C-way config mix exactly like the restricted kernel
#
# Branch semantics mirror dp/tabular_key._backup term for term, so the
# result equals key_value_iteration up to float associativity.
# ---------------------------------------------------------------------------


def _build_key_masks(layout, HW: int):
    """Per-layout mask planes for the key-domain kernel, flattened to the
    (..., HW) raster; the caller concatenates P layouts along the lane
    axis.  All f32."""
    from minigrid_dynamicprogramming_tpu.dp.tabular_key import (
        KeyTabularLayout,
        _DIRS as KDIRS,
        _door_tables,
        _front_index,
        _shift_from,
    )

    h, w = layout.base_walk.shape
    f32 = jnp.float32
    K = HW + 1
    CARRIED = HW

    _, door_block, bitmask, locked_cell, closed_cell = _door_tables(layout)
    C = door_block.shape[0]
    unlock_cell = locked_cell & layout.door_unlockable[
        jnp.clip(layout.door_id, 0, layout.n_doors - 1)
    ][None]
    kloc = jnp.arange(K, dtype=jnp.int32)

    walk_n, goal_n, lava_n, keyfront, target_n, dropsel, droppable_n = (
        [], [], [], [], [], [], [])
    closed_n, unlock_n, tmask = [], [], []
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    target_cell = (xs == layout.target_pos[0]) & (ys == layout.target_pos[1])
    cfg = jnp.arange(C, dtype=jnp.int32)
    for dxy in KDIRS:
        fidx = _front_index(h, w, dxy)  # (H, W), -1 OOB
        base = layout.base_walk[None] & ~door_block  # (C, H, W)
        walk_n.append(_shift_from(base.astype(f32), dxy).reshape(C, HW))
        goal_n.append(_shift_from(layout.goal.astype(f32), dxy).reshape(HW))
        lava_n.append(_shift_from(layout.lava.astype(f32), dxy).reshape(HW))
        kf = (kloc[:, None] == fidx.reshape(-1)[None]) & (
            fidx.reshape(-1) >= 0
        )[None]
        kf = kf.at[CARRIED].set(False)
        keyfront.append(kf.astype(f32))  # (K, HW)
        target_n.append(
            _shift_from(target_cell.astype(jnp.int32), dxy)
            .astype(f32).reshape(HW)
        )
        drp = (
            _shift_from(layout.base_empty, dxy)
            & (fidx >= 0)
            & ~_shift_from(layout.door_id >= 0, dxy)
        ).reshape(HW)  # (HW,)
        droppable_n.append(drp.astype(f32))
        dsel = (kloc[:, None] == fidx.reshape(-1)[None]) & drp[None]
        dropsel.append(dsel.astype(f32))  # (K, HW)
        closed_n.append(_shift_from(closed_cell, dxy).astype(f32).reshape(C, HW))
        unlock_n.append(_shift_from(unlock_cell, dxy).astype(f32).reshape(C, HW))
        bit_n = _shift_from(bitmask, dxy).reshape(HW)  # (HW,) int32
        new_cfg = cfg[:, None] | bit_n[None]  # (C, HW)
        tmask.append(
            (new_cfg[:, None, :] == cfg[None, :, None]).astype(f32)
        )  # (C, C', HW)

    stack = lambda xs_: jnp.stack(xs_, 0)
    return (
        stack(walk_n),      # (4, C, HW)
        stack(goal_n),      # (4, HW)
        stack(lava_n),      # (4, HW)
        stack(keyfront),    # (4, K, HW)
        stack(target_n),    # (4, HW)
        stack(droppable_n), # (4, HW)
        stack(dropsel),     # (4, K, HW)
        stack(closed_n),    # (4, C, HW)
        stack(unlock_n),    # (4, C, HW)
        stack(tmask),       # (4, C, C, HW)
    )


def _key_vi_kernel(
    walk_ref, goal_ref, lava_ref, keyf_ref, targ_ref, drpn_ref, dsel_ref,
    closed_ref, unlock_ref, tmask_ref,
    vout_ref, v_s, v_n, *, C, K, W, HW, L, gamma, n_sweeps,
):
    CARRIED = HW  # sublane row of the carried-key slice
    v_s[:] = jnp.zeros_like(v_s)
    # Lane rolls are cyclic over the FULL packed lane width L (not HW —
    # reducing the shift mod HW would land interior reads in the adjacent
    # layout's segment); wrapped reads then only correspond to
    # out-of-bounds fronts, which the border walls baked into the walk
    # masks keep from ever being selected.
    shifts = [(-(dy * W + dx)) % L for dx, dy in
              ((1, 0), (0, 1), (-1, 0), (0, -1))]

    def sweep(_, carry=None):
        for c in range(C):
            for d in range(4):
                v_cd = v_s[c, d]  # (K, L)
                row = jax.lax.broadcasted_iota(jnp.int32, (K, L), 0)
                # left / right (Actions 0/1): static dir-slab picks.
                q = jnp.maximum(v_s[c, (d - 1) % 4], v_s[c, (d + 1) % 4])
                # forward (Action 2): lane roll + per-(k, cell) walk mask.
                vn = pltpu.roll(v_cd, shifts[d], axis=1)
                can = (walk_ref[0, d, c] > 0)[None] & ~(keyf_ref[0, d] > 0)
                qf = jnp.where(can, vn, v_cd)
                qf = jnp.where((lava_ref[0, d] > 0)[None], 0.0, qf)
                q = jnp.maximum(q, qf)
                # pickup (Action 3): facing the key -> CARRIED row.
                v_car = v_cd[CARRIED][None]  # (1, L)
                q = jnp.maximum(
                    q, jnp.where(keyf_ref[0, d] > 0, v_car, v_cd)
                )
                # drop (Action 4): CARRIED row jumps to the front cell's
                # key-loc row — diagonal gather via sublane reduction.
                diag = jnp.sum(v_cd * dsel_ref[0, d], axis=0)  # (L,)
                q_drop_car = jnp.where(
                    drpn_ref[0, d] > 0, diag, v_cd[CARRIED]
                )
                q = jnp.maximum(
                    q,
                    jnp.where(row == CARRIED, q_drop_car[None], v_cd),
                )
                # toggle (Action 5): config mix where facing a door this
                # state can open (closed always; locked iff key carried).
                tv = tmask_ref[0, d, c, 0] * v_s[0, d]
                for c2 in range(1, C):
                    tv = tv + tmask_ref[0, d, c, c2] * v_s[c2, d]
                allowed = (closed_ref[0, d, c] > 0)[None] | (
                    (unlock_ref[0, d, c] > 0)[None] & (row == CARRIED)
                )
                q = jnp.maximum(q, jnp.where(allowed, tv, v_cd))
                # stay (done / failed actions).
                q = jnp.maximum(q, v_cd)
                q = gamma * q
                # terminal overrides (undiscounted 1.0; they dominate every
                # discounted branch, so post-max application is exact —
                # tabular_key._backup applies them per branch):
                q = jnp.where((goal_ref[0, d] > 0)[None], 1.0, q)
                q = jnp.where(
                    (targ_ref[0, d] > 0)[None] & (row != CARRIED), 1.0, q
                )
                v_n[c, d] = q
        v_s[:] = v_n[:]
        return carry

    jax.lax.fori_loop(0, n_sweeps, sweep, None)
    vout_ref[0] = v_s[:]


@partial(jax.jit, static_argnames=("gamma", "n_sweeps"))
def pallas_key_value_iteration(layouts, gamma: float = 0.995, n_sweeps: int = 256):
    """Batched key-domain VI on TPU via the VMEM-resident kernel.

    ``layouts`` is a vmapped :class:`..tabular_key.KeyTabularLayout` with
    leading batch axis B.  Returns V with shape (B, K, C, 4, H, W) matching
    ``vmap(key_value_iteration)``'s V (up to float associativity).  The
    policy, if needed, is one extra XLA argmax backup over this V."""
    B = layouts.base_walk.shape[0]
    h, w = layouts.base_walk.shape[1:]
    HW = h * w
    K = HW + 1
    D = layouts.door_pos.shape[-2]
    C = 1 << D
    P = max(1, LANES // HW)  # layouts packed per block along lanes
    L = P * HW

    masks = jax.vmap(partial(_build_key_masks, HW=HW))(layouts)
    padB = (-B) % P
    if padB:
        masks = [
            jnp.concatenate([m, jnp.zeros((padB,) + m.shape[1:], m.dtype)])
            for m in masks
        ]
    Bp = B + padB
    G = Bp // P

    # Group P layouts per block: (Bp, 4, ..., HW) -> (G, 4, ..., P * HW),
    # keeping K/C axes intact and concatenating rasters along lanes.
    def group(m):
        m = m.reshape((G, P) + m.shape[1:])          # (G, P, 4, ..., HW)
        m = jnp.moveaxis(m, 1, -2)                   # (G, 4, ..., P, HW)
        return m.reshape(m.shape[:-2] + (L,))        # (G, 4, ..., L)

    masks = [group(m) for m in masks]

    # keyfront/dropsel carry a per-layout K axis whose CELL rows refer to
    # that layout's own raster; rows are local to each layout, so the
    # sublane axis stays K and the mask is zero outside the layout's lane
    # segment by construction (fidx/kloc comparisons never cross segments).

    grid = (G,)

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            (1,) + shape,
            lambda i: (i,) + (0,) * nd,
            memory_space=pltpu.VMEM,
        )

    kernel = partial(
        _key_vi_kernel, C=C, K=K, W=w, HW=HW, L=L, gamma=gamma,
        n_sweeps=n_sweeps,
    )
    shapes = [
        (4, C, L), (4, L), (4, L), (4, K, L), (4, L), (4, L), (4, K, L),
        (4, C, L), (4, C, L), (4, C, C, L),
    ]
    v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec(s) for s in shapes],
        out_specs=spec((C, 4, K, L)),
        out_shape=jax.ShapeDtypeStruct((G, C, 4, K, L), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, 4, K, L), jnp.float32),
            pltpu.VMEM((C, 4, K, L), jnp.float32),
        ],
    )(*masks)

    # (G, C, 4, K, L) -> (Bp, C, 4, K, HW) -> (B, K, C, 4, H, W)
    v = v.reshape(G, C, 4, K, P, HW)
    v = jnp.moveaxis(v, 4, 1).reshape(Bp, C, 4, K, HW)[:B]
    v = jnp.moveaxis(v, 3, 1)  # (B, K, C, 4, HW)
    return v.reshape(B, K, C, 4, h, w)
