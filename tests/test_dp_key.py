"""Exactness of the key-tracking DP solver (dp/tabular_key.py) on the
pickup-terminal family the restricted solver cannot express: KeyCorridor
and ObstructedMaze-1Dl, where the agent must pick the key, unlock, DROP the
key, and pick up the target object — and the dropped key occupies a real
cell.

Oracle: BFS over the reference env including the drop action (the dropped
key's position is part of the BFS state via the grid encoding), so any
inexactness in the key-position modeling fails these tests.
"""

from __future__ import annotations

from copy import deepcopy
from functools import partial

import numpy as np
import pytest

import jax

import minigrid_dynamicprogramming_tpu as mgtpu
from minigrid_dynamicprogramming_tpu.core.constants import (
    COLOR_TO_IDX,
    OBJECT_TO_IDX,
)
from minigrid_dynamicprogramming_tpu.dp.tabular_key import (
    extract_key_layout,
    key_greedy_action,
    key_state_value,
    key_steps_to_go,
    key_value_iteration,
)
from minigrid_dynamicprogramming_tpu.utils.parity import (
    aux_from_reference,
    state_from_reference,
)

from .oracle import make_reference_env

GAMMA = 0.995
ALL_ACTIONS = (0, 1, 2, 3, 4, 5)  # incl. drop — required in this family


def _ref_key(env):
    e = env.unwrapped
    return (
        e.grid.encode().tobytes(),
        tuple(int(x) for x in e.agent_pos),
        int(e.agent_dir),
        None if e.carrying is None else (e.carrying.type, e.carrying.color),
    )


def bfs_optimal_steps(ref_env, max_depth=60):
    frontier = [deepcopy(ref_env)]
    seen = {_ref_key(ref_env)}
    for depth in range(1, max_depth + 1):
        nxt = []
        for env in frontier:
            for a in ALL_ACTIONS:
                child = deepcopy(env)
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


CASES = [
    ("MiniGrid-KeyCorridorS3R2-v0", 0, 6),
    ("MiniGrid-KeyCorridorS3R2-v0", 3, 6),
    ("MiniGrid-ObstructedMaze-1Dl-v0", 0, 1),
    ("MiniGrid-ObstructedMaze-1Dl-v0", 5, 1),
    # the restricted domain's own family must stay exact in the new solver
    ("MiniGrid-DoorKey-5x5-v0", 0, 1),
    ("MiniGrid-DoorKey-5x5-v0", 7, 1),
]


def _solve_from_reference(env_id, seed, max_doors):
    ref_env, _ = make_reference_env(env_id, seed)
    state = state_from_reference(ref_env)
    state = aux_from_reference(ref_env, state)
    e = ref_env.unwrapped
    if hasattr(e, "obj"):  # pickup-terminal envs expose the target object
        t_type = OBJECT_TO_IDX[e.obj.type]
        t_color = COLOR_TO_IDX[e.obj.color]
    else:
        t_type = t_color = -1
    layout = extract_key_layout(
        state, max_doors=max_doors, target_type=t_type, target_color=t_color
    )
    v, pol = key_value_iteration(layout, gamma=GAMMA, n_sweeps=96)
    return ref_env, state, layout, v, pol


@pytest.mark.parametrize("env_id,seed,max_doors", CASES)
def test_key_vi_matches_bfs(env_id, seed, max_doors):
    ref_env, state, layout, v, _ = _solve_from_reference(env_id, seed, max_doors)
    got = float(key_steps_to_go(key_state_value(v, layout, state), GAMMA))
    want = bfs_optimal_steps(ref_env)
    assert got == want, f"{env_id} seed={seed}: VI={got} BFS={want}"
    ref_env.close()


@pytest.mark.parametrize(
    "env_id,seed,max_doors",
    [
        ("MiniGrid-KeyCorridorS3R2-v0", 1, 6),
        ("MiniGrid-ObstructedMaze-1Dl-v0", 2, 1),
    ],
)
def test_key_greedy_rollout_realizes_vi(env_id, seed, max_doors):
    """The greedy VI policy driven through OUR device env must terminate
    with positive reward in exactly the VI-predicted number of steps."""
    ref_env, state, layout, v, pol = _solve_from_reference(
        env_id, seed, max_doors
    )
    dist = float(key_steps_to_go(key_state_value(v, layout, state), GAMMA))
    assert np.isfinite(dist)

    env = mgtpu.make(env_id)
    step = jax.jit(env.step)
    ga = jax.jit(key_greedy_action)
    key = jax.random.PRNGKey(0)
    st = state
    for t in range(int(dist)):
        act = ga(pol, layout, st)
        key, k2 = jax.random.split(key)
        _, st, r, term, trunc, _ = step(k2, st, act)
        if t + 1 < int(dist):
            assert not bool(term), f"{env_id} terminated early at {t + 1}"
    assert bool(term) and float(r) > 0, (env_id, seed, dist)
    ref_env.close()


def test_assert_dp_scope_flags_overflow_and_multikey():
    from minigrid_dynamicprogramming_tpu.dp.tabular import assert_dp_scope

    ref_env, _ = make_reference_env("MiniGrid-KeyCorridorS3R2-v0", 0)
    state = state_from_reference(ref_env)
    # KeyCorridorS3R2 has several closed doors: a 1-door budget is unsound
    with pytest.raises(ValueError):
        assert_dp_scope(state, max_doors=1)
    assert_dp_scope(state, max_doors=6)  # in-budget: fine
    ref_env.close()

    ref_env2, _ = make_reference_env("MiniGrid-DoorKey-5x5-v0", 0)
    st2 = state_from_reference(ref_env2)
    assert_dp_scope(st2, max_doors=1)
    from minigrid_dynamicprogramming_tpu.core.constants import OBJ_KEY

    two_keys = st2.replace(grid_obj=st2.grid_obj.at[1, 1].set(OBJ_KEY))
    with pytest.raises(ValueError):
        assert_dp_scope(two_keys, max_doors=1)
    ref_env2.close()
