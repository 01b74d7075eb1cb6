"""Distribution-level generator parity against the reference.

The on-device generators replace the reference's Python rejection loops with
masked categorical draws; these tests check the *accepted* distributions
match, not just structural validity — a masked-rejection bias (e.g. a retry
loop that silently keeps a biased fallback) shifts the frequencies and fails
the two-sample chi-square here.

Families covered (the ones round-1 review flagged as untested):
  - MultiRoom room-count and room-size/door-color distributions
    (/root/reference/minigrid/envs/multiroom.py:187-281)
  - Memory object / hallway-length / success-pos distribution
    (/root/reference/minigrid/envs/memory.py:100-150)
  - KeyCorridor locked-room / key-room / color placements
    (/root/reference/minigrid/envs/keycorridor.py:104-122)
  - BabyAI LevelGen instruction-shape frequencies
    (/root/reference/minigrid/envs/babyai/core/levelgen.py:157-210)
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest

import jax

import minigrid_dynamicprogramming_tpu as mgtpu
from minigrid_dynamicprogramming_tpu.core.constants import (
    OBJ_BALL,
    OBJ_DOOR,
    OBJ_GOAL,
    OBJ_KEY,
)

from .oracle import make_reference_env

N = 2048  # samples per side
ALPHA = 1e-4  # loose: catches biases, tolerates sampling noise


# -- two-sample chi-square ----------------------------------------------------


def assert_same_distribution(ours: Counter, ref: Counter, label: str):
    """Two-sample chi-square on the union of categories, merging rare bins
    so every expected cell count is >= 5."""
    from scipy.stats import chi2_contingency

    cats = sorted(set(ours) | set(ref), key=lambda k: -(ours[k] + ref[k]))
    a = np.array([ours[k] for k in cats], dtype=np.float64)
    b = np.array([ref[k] for k in cats], dtype=np.float64)
    # Merge the tail into one bin until each pooled count is comfortably >= 10
    # (expected-per-cell >= ~5 with two roughly equal samples).
    while len(a) > 2 and (a[-1] + b[-1]) < 20:
        a[-2] += a[-1]
        b[-2] += b[-1]
        a, b = a[:-1], b[:-1]
    if len(a) < 2:
        return  # degenerate: both sides constant -> identical by construction
    chi2, p, dof, _ = chi2_contingency(np.stack([a, b]))
    assert p > ALPHA, (
        f"{label}: distribution mismatch (chi2={chi2:.1f}, dof={dof}, p={p:.2e})\n"
        f"cats={cats[:12]}\nours={a[:12]}\nref ={b[:12]}"
    )


def batch_reset_ours(env, n=N, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    state = jax.jit(
        jax.vmap(env.generate, in_axes=(0, None)), static_argnums=1
    )(keys, env.params)
    return jax.tree_util.tree_map(np.asarray, state)


def ref_resets(env_id_or_env, n=N):
    if isinstance(env_id_or_env, str):
        env, _ = make_reference_env(env_id_or_env, seed=0)
    else:
        env = env_id_or_env
    for s in range(n):
        env.reset(seed=10_000 + s)
        yield env.unwrapped


# -- MultiRoom ----------------------------------------------------------------


def _door_cells(obj_plane, state_plane=None):
    return np.argwhere(obj_plane == OBJ_DOOR)


def test_multiroom_room_count_distribution():
    """numRooms ~ Uniform{2..5} (multiroom.py:116); rooms are chained with
    one door between consecutive rooms, so rooms == doors + 1.  A best-chain
    fallback that fails to reach numRooms would skew this histogram."""
    from minigrid_dynamicprogramming_tpu.envs.multiroom import make_multiroom

    env = make_multiroom("custom", min_num_rooms=2, max_num_rooms=5,
                         max_room_size=6)
    state = batch_reset_ours(env)
    ours = Counter(
        int((state.grid_obj[b] == OBJ_DOOR).sum()) + 1 for b in range(N)
    )

    import sys
    sys.path.insert(0, "/root/reference")
    from minigrid.envs.multiroom import MultiRoomEnv

    renv = MultiRoomEnv(minNumRooms=2, maxNumRooms=5, maxRoomSize=6)
    ref = Counter()
    for s in range(N):
        renv.reset(seed=10_000 + s)
        ref[len(renv.rooms)] += 1
    assert_same_distribution(ours, ref, "MultiRoom room count")


def test_multiroom_size_and_color_distribution():
    """Room sizes ~ Uniform{4..maxRoomSize}^2 per room; door colors uniform
    over the 6 colors minus the previous door's (multiroom.py:163-170).
    Wall-cell count is a sharp proxy for the joint size distribution."""
    env = mgtpu.make("MiniGrid-MultiRoom-N6-v0")
    state = batch_reset_ours(env)
    ours_walls = Counter()
    ours_colors = Counter()
    for b in range(N):
        obj = state.grid_obj[b]
        ours_walls[int((obj == 2).sum()) // 4] += 1  # bucket by 4 cells
        for y, x in _door_cells(obj):
            ours_colors[int(state.grid_color[b, y, x])] += 1

    ref_walls = Counter()
    ref_colors = Counter()
    for uenv in ref_resets("MiniGrid-MultiRoom-N6-v0"):
        enc = uenv.grid.encode()  # (w, h, 3)
        ref_walls[int((enc[:, :, 0] == 2).sum()) // 4] += 1
        doors = np.argwhere(enc[:, :, 0] == 4)
        for x, y in doors:
            ref_colors[int(enc[x, y, 1])] += 1
    assert_same_distribution(ours_walls, ref_walls, "MultiRoom wall count")
    assert_same_distribution(ours_colors, ref_colors, "MultiRoom door colors")


# -- Memory -------------------------------------------------------------------


def _memory_stats(obj_plane, agent_x, h):
    mid = h // 2
    start_obj = int(obj_plane[mid - 1, 1])
    # End objects sit at (hallway_end + 1, mid -/+ 2) (memory.py:137-141).
    row = obj_plane[mid - 2]
    xs = np.nonzero((row == OBJ_KEY) | (row == OBJ_BALL))[0]
    assert len(xs) == 1
    hallway_end = int(xs[0]) - 1
    top_obj = int(row[xs[0]])
    return hallway_end, start_obj == OBJ_KEY, top_obj == OBJ_KEY, int(agent_x)


def test_memory_distribution():
    """hallway_end ~ Uniform{4..w-3} (memory.py:107), start object 50/50
    key/ball, end-object order 50/50, agent x ~ Uniform{1..hallway_end}."""
    env = mgtpu.make("MiniGrid-MemoryS13Random-v0")
    h = env.params.height
    state = batch_reset_ours(env)
    ours_joint, ours_agent = Counter(), Counter()
    for b in range(N):
        he, sk, tk, ax = _memory_stats(
            state.grid_obj[b], state.agent_pos[b][0], h
        )
        ours_joint[(he, sk, tk)] += 1
        ours_agent[ax] += 1

    ref_joint, ref_agent = Counter(), Counter()
    for uenv in ref_resets("MiniGrid-MemoryS13Random-v0"):
        enc = uenv.grid.encode().transpose(1, 0, 2)  # -> (h, w, 3)
        he, sk, tk, ax = _memory_stats(
            enc[:, :, 0], uenv.agent_pos[0], h
        )
        ref_joint[(he, sk, tk)] += 1
        ref_agent[ax] += 1
    assert_same_distribution(ours_joint, ref_joint, "Memory (end, objs) joint")
    assert_same_distribution(ours_agent, ref_agent, "Memory agent x")


# -- KeyCorridor ---------------------------------------------------------------


def _keycorridor_stats(obj_plane, color_plane, state_plane, room_size):
    doors = np.argwhere(obj_plane == OBJ_DOOR)
    locked = [(y, x) for y, x in doors if state_plane[y, x] == 2]
    assert len(locked) == 1
    ly, lx = locked[0]
    keys = np.argwhere(obj_plane == OBJ_KEY)
    assert len(keys) == 1
    ky, kx = keys[0]
    row_of = lambda y: (y - 1) // (room_size - 1)
    return row_of(ly), row_of(ky), int(color_plane[ly, lx])


def test_keycorridor_distribution():
    """Locked-door room ~ Uniform{0..2}, key room ~ Uniform{0..2},
    independent; door color ~ Uniform over 6 (keycorridor.py:112-118 via
    add_door's color draw)."""
    rs = 3
    env = mgtpu.make("MiniGrid-KeyCorridorS3R3-v0")
    state = batch_reset_ours(env)
    ours_joint, ours_color = Counter(), Counter()
    for b in range(N):
        lr, kr, col = _keycorridor_stats(
            state.grid_obj[b], state.grid_color[b], state.grid_state[b], rs
        )
        ours_joint[(lr, kr)] += 1
        ours_color[col] += 1

    ref_joint, ref_color = Counter(), Counter()
    for uenv in ref_resets("MiniGrid-KeyCorridorS3R3-v0"):
        enc = uenv.grid.encode().transpose(1, 0, 2)
        lr, kr, col = _keycorridor_stats(
            enc[:, :, 0], enc[:, :, 1], enc[:, :, 2], rs
        )
        ref_joint[(lr, kr)] += 1
        ref_color[col] += 1
    assert_same_distribution(ours_joint, ref_joint, "KeyCorridor rooms joint")
    assert_same_distribution(ours_color, ref_color, "KeyCorridor door color")


# -- BabyAI LevelGen instruction shapes ----------------------------------------

_KIND_NAME = {1: "goto", 2: "open", 3: "pickup", 4: "putnext"}


def _ours_shape(codes):
    comb = {0: "single", 1: "before", 2: "after"}[int(codes[0])]

    def clause_shape(off):
        nand = int(codes[off])
        k0 = _KIND_NAME.get(int(codes[off + 1]), "none")
        k1 = _KIND_NAME.get(int(codes[off + 12]), "none")
        return f"and({k0},{k1})" if nand else k0

    a = clause_shape(2)
    if comb == "single":
        return a
    return f"{comb}({a},{clause_shape(25)})"


def _ref_shape(instr):
    from minigrid.envs.babyai.core.verifier import (
        AfterInstr,
        AndInstr,
        BeforeInstr,
        GoToInstr,
        OpenInstr,
        PickupInstr,
        PutNextInstr,
    )

    def leaf(i):
        return {
            GoToInstr: "goto",
            OpenInstr: "open",
            PickupInstr: "pickup",
            PutNextInstr: "putnext",
        }[type(i)]

    def clause(i):
        if isinstance(i, AndInstr):
            return f"and({leaf(i.instr_a)},{leaf(i.instr_b)})"
        return leaf(i)

    if isinstance(i := instr, BeforeInstr):
        return f"before({clause(i.instr_a)},{clause(i.instr_b)})"
    if isinstance(i, AfterInstr):
        return f"after({clause(i.instr_a)},{clause(i.instr_b)})"
    return clause(i)


# MiniBossLevel covers the full LevelGen instruction sampler in the
# default tier; SynthSeq (same sampler, deeper acceptance loop, ~26 s on
# the CI runner) moves to -m slow.
@pytest.mark.parametrize("env_id", ["BabyAI-MiniBossLevel-v0"])
def test_levelgen_instruction_shape_distribution(env_id):
    """rand_instr draws instr kind uniform over {action, and, seq}, then
    action kinds uniform (levelgen.py:157-210), *conditioned on* the
    validate_instrs acceptance loop (roomgrid_level.py:61-74) — the accepted
    shape frequencies are the observable distribution."""
    env = mgtpu.make(env_id)
    state = batch_reset_ours(env)
    ours_root, ours_leaf = Counter(), Counter()
    for b in range(N):
        shape = _ours_shape(state.mission[b])
        root = shape.split("(")[0] if "(" in shape else "leaf"
        ours_root[root if root in ("before", "after", "and") else "leaf"] += 1
        for k in _KIND_NAME.values():
            ours_leaf[k] += shape.count(k)

    ref_root, ref_leaf = Counter(), Counter()
    for uenv in ref_resets(env_id):
        shape = _ref_shape(uenv.instrs)
        root = shape.split("(")[0] if "(" in shape else "leaf"
        ref_root[root if root in ("before", "after", "and") else "leaf"] += 1
        for k in _KIND_NAME.values():
            ref_leaf[k] += shape.count(k)
    assert_same_distribution(ours_root, ref_root, f"{env_id} root shape")
    assert_same_distribution(ours_leaf, ref_leaf, f"{env_id} leaf kinds")


@pytest.mark.slow
@pytest.mark.parametrize("env_id", ["BabyAI-SynthSeq-v0"])
def test_levelgen_instruction_shape_distribution_deep(env_id):
    test_levelgen_instruction_shape_distribution(env_id)
