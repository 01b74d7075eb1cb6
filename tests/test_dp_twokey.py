"""Exactness of the two-key-chain DP solver (dp/tabular_twokey.py) on
BabyAI-UnlockToUnlock (/root/reference/minigrid/envs/babyai/unlock.py:395-471):
unlock door A (key A in the far room... behind door B) — the canonical
key->door->key->door->target chain that no single-key domain covers.

Oracle: BFS over the reference env with the full 6-action set, so both
keys' positions (incl. drops anywhere) and both door states are part of
the BFS state via the grid encoding — any inexactness in the two-key
modeling fails these tests.  Same oracle design as tests/test_dp_obstructed.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax

import minigrid_dynamicprogramming_tpu as mgtpu
from minigrid_dynamicprogramming_tpu.core.constants import (
    COLOR_TO_IDX,
    OBJECT_TO_IDX,
)
from minigrid_dynamicprogramming_tpu.dp.tabular_twokey import (
    extract_twokey_layout,
    twokey_greedy_action,
    twokey_state_value,
    twokey_steps_to_go,
    twokey_value_iteration,
)
from minigrid_dynamicprogramming_tpu.utils.parity import (
    aux_from_reference,
    state_from_reference,
)

from copy import deepcopy

from .oracle import make_reference_env
from .test_dp_key import ALL_ACTIONS, _ref_key

GAMMA = 0.995
SWEEPS = 112  # two rooms of detour: optimal chains run ~50-90 steps


def _clone_babyai(u):
    """Expansion clone of an unwrapped BabyAI env: immutable machinery is
    shared shallowly; grid, carried object, and the verifier instruction
    tree (whose ObjDesc.obj_set holds grid-object references) are
    deepcopied under ONE memo so identity links survive.  The memo is
    pre-seeded with ``id(u) -> new_u`` so the instruction tree's ``env``
    backref (set by reset_verifier) resolves to the clone — otherwise
    ``verify`` reads a stale env whose ``carrying`` the clone's step never
    mutates and success is never detected.  gen_obs is stubbed out —
    observations don't affect the transition."""
    new_u = object.__new__(type(u))
    new_u.__dict__ = dict(u.__dict__)
    memo = {id(u): new_u}
    new_u.grid, new_u.carrying, new_u.instrs = deepcopy(
        (u.grid, u.carrying, u.instrs), memo
    )
    new_u.gen_obs = lambda: None
    return new_u


def bfs_optimal_steps_babyai(ref_env, max_depth=100):
    u0 = ref_env.unwrapped
    frontier = [_clone_babyai(u0)]
    seen = {_ref_key(ref_env)}
    for depth in range(1, max_depth + 1):
        nxt = []
        for env in frontier:
            for a in ALL_ACTIONS:
                child = _clone_babyai(env)
                _, r, term, trunc, _ = child.step(a)
                if term and r > 0:
                    return depth
                if term or trunc:
                    continue
                k = _ref_key(child)
                if k not in seen:
                    seen.add(k)
                    nxt.append(child)
        frontier = nxt
        if not frontier:
            return np.inf
    return np.inf


def _make_small_u2u(seed, room_size=4):
    """UnlockToUnlock at room_size=4 (10x4 grid): identical two-key chain
    semantics (two locked doors, two colored keys, far-room target) at a
    tractable CPU test size — the registered room_size=6 instance runs in
    the slow tier (its VI tensor alone is 59 MB and the BFS frontier runs
    to millions of states)."""
    from minigrid.envs.babyai.core.roomgrid_level import RoomGridLevel
    from minigrid.envs.babyai.unlock import UnlockToUnlock

    env = object.__new__(UnlockToUnlock)
    RoomGridLevel.__init__(
        env, num_rows=1, num_cols=3, room_size=room_size, max_steps=480
    )
    env.reset(seed=seed)
    return env


def _solve_env(ref_env):
    from minigrid_dynamicprogramming_tpu.utils.parity import (
        babyai_from_reference,
    )

    state = state_from_reference(ref_env)
    state = aux_from_reference(ref_env, state)
    # Mission codes + mark planes so the device verifier can fire success
    # when the greedy rollout picks the target.
    state = babyai_from_reference(ref_env, state)
    e = ref_env.unwrapped
    # UnlockToUnlock's objective is "pick up the ball" (instrs target).
    desc = e.instrs.desc
    t_type = OBJECT_TO_IDX[desc.type]
    if desc.color is not None:
        t_color = COLOR_TO_IDX[desc.color]
    else:
        # "pick up the ball" names no color: resolve from the single ball
        # on the grid (unlock.py:466 adds exactly one).
        obj = np.asarray(state.grid_obj)
        col = np.asarray(state.grid_color)
        ys, xs = np.nonzero(obj == OBJECT_TO_IDX["ball"])
        t_color = int(col[ys[0], xs[0]])
    layout = extract_twokey_layout(
        state, max_doors=2, target_type=t_type, target_color=t_color
    )
    v, pol = twokey_value_iteration(layout, gamma=GAMMA, n_sweeps=SWEEPS)
    return state, layout, v, pol


@pytest.mark.parametrize("seed", [0, 1])
def test_twokey_vi_matches_bfs_small(seed):
    ref_env = _make_small_u2u(seed)
    state, layout, v, _ = _solve_env(ref_env)
    got = float(
        twokey_steps_to_go(twokey_state_value(v, layout, state), GAMMA)
    )
    want = bfs_optimal_steps_babyai(ref_env, max_depth=60)
    assert np.isfinite(got)
    assert got == want, f"small-u2u seed={seed}: VI={got} BFS={want}"
    ref_env.close()


@pytest.mark.parametrize("seed", [2])
def test_twokey_greedy_solves_reference_small(seed):
    """The greedy VI policy driven through the REFERENCE env (two unlocks,
    key swap via drop, final pickup) must succeed in exactly the
    VI-predicted number of steps."""
    ref_env = _make_small_u2u(seed)
    state, layout, v, pol = _solve_env(ref_env)
    dist = float(
        twokey_steps_to_go(twokey_state_value(v, layout, state), GAMMA)
    )
    assert np.isfinite(dist)
    for t in range(int(dist)):
        st = aux_from_reference(ref_env, state_from_reference(ref_env))
        act = int(twokey_greedy_action(pol, layout, st))
        _, r, term, trunc, _ = ref_env.step(act)
        assert not trunc
        if t + 1 < int(dist):
            assert not term, f"terminated early at {t + 1}"
    assert term and r > 0, (seed, dist, r)
    ref_env.close()


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0])
def test_twokey_vi_matches_bfs_registered(seed):
    """The registered BabyAI-UnlockToUnlock-v0 (room_size=6): VI over the
    full 14.7M-state tensor vs the BFS oracle."""
    ref_env, _ = make_reference_env("BabyAI-UnlockToUnlock-v0", seed)
    state, layout, v, _ = _solve_env(ref_env)
    got = float(
        twokey_steps_to_go(twokey_state_value(v, layout, state), GAMMA)
    )
    want = bfs_optimal_steps_babyai(ref_env, max_depth=100)
    assert got == want, f"seed={seed}: VI={got} BFS={want}"
    ref_env.close()


@pytest.mark.slow
@pytest.mark.parametrize("seed", [2])
def test_twokey_greedy_rollout_realizes_vi_device(seed):
    """Greedy VI policy driven through OUR device env on the registered id
    must terminate with positive reward in exactly the VI-predicted steps."""
    ref_env, _ = make_reference_env("BabyAI-UnlockToUnlock-v0", seed)
    state, layout, v, pol = _solve_env(ref_env)
    dist = float(
        twokey_steps_to_go(twokey_state_value(v, layout, state), GAMMA)
    )
    assert np.isfinite(dist)

    env = mgtpu.make("BabyAI-UnlockToUnlock-v0")
    step = jax.jit(env.step)
    ga = jax.jit(twokey_greedy_action)
    key = jax.random.PRNGKey(0)
    st = state
    for t in range(int(dist)):
        act = ga(pol, layout, st)
        key, k2 = jax.random.split(key)
        _, st, r, term, trunc, _ = step(k2, st, act)
        if t + 1 < int(dist):
            assert not bool(term), f"terminated early at {t + 1}"
    assert bool(term) and float(r) > 0, (seed, dist)
    ref_env.close()
