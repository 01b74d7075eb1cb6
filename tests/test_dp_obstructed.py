"""Exactness of the obstructed-domain DP solver (dp/tabular_obstructed.py)
on the two sub-families outside the key-tracking domain: box-hidden keys
(ObstructedMaze-1Dlhb: toggle the grey box to reveal the key,
/root/reference/minigrid/envs/obstructedmaze.py:230-245) and movable
blocking balls (BlockedUnlockPickup: pick the ball off the door cell and
drop it elsewhere, blockedunlockpickup.py:99-104).

Oracle: BFS over the reference env with the full 6-action set, so the
ball's position, the box state, and the dropped key's position are all
part of the BFS state via the grid encoding — any inexactness in the
widened modeling fails these tests.
"""

from __future__ import annotations

from copy import deepcopy

import numpy as np
import pytest

import jax

import minigrid_dynamicprogramming_tpu as mgtpu
from minigrid_dynamicprogramming_tpu.core.constants import (
    COLOR_TO_IDX,
    OBJECT_TO_IDX,
)
from minigrid_dynamicprogramming_tpu.dp.tabular_obstructed import (
    extract_obstructed_layout,
    obstructed_greedy_action,
    obstructed_state_value,
    obstructed_steps_to_go,
    obstructed_value_iteration,
)
from minigrid_dynamicprogramming_tpu.utils.parity import (
    aux_from_reference,
    state_from_reference,
)

from .oracle import make_reference_env
from .test_dp_key import ALL_ACTIONS, _ref_key

GAMMA = 0.995
SWEEPS = 80


def _clone(u):
    """Cheap expansion clone of an unwrapped reference env: the immutable
    machinery (spaces, np_random, mission space) is shared shallowly and
    only the mutable episode state — grid, carried object, and the target
    ``obj`` — is deepcopied, under ONE memo so the ``carrying == self.obj``
    identity check in the step override keeps working on the clone.
    ``gen_obs`` is stubbed out: observations don't affect the transition
    and were ~40% of the naive deepcopy-everything BFS's cost."""
    new_u = object.__new__(type(u))
    new_u.__dict__ = dict(u.__dict__)
    new_u.grid, new_u.carrying, new_u.obj = deepcopy(
        (u.grid, u.carrying, u.obj)
    )
    new_u.gen_obs = lambda: None
    return new_u


def bfs_optimal_steps(ref_env, max_depth=70):
    u0 = ref_env.unwrapped
    frontier = [_clone(u0)]
    seen = {_ref_key(ref_env)}
    for depth in range(1, max_depth + 1):
        nxt = []
        for env in frontier:
            for a in ALL_ACTIONS:
                child = _clone(env)
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


def _solve_from_reference(env_id, seed):
    ref_env, _ = make_reference_env(env_id, seed)
    state = state_from_reference(ref_env)
    state = aux_from_reference(ref_env, state)
    e = ref_env.unwrapped
    t_type = OBJECT_TO_IDX[e.obj.type]
    t_color = COLOR_TO_IDX[e.obj.color]
    layout = extract_obstructed_layout(
        state, max_doors=1, target_type=t_type, target_color=t_color
    )
    v, pol = obstructed_value_iteration(layout, gamma=GAMMA, n_sweeps=SWEEPS)
    return ref_env, state, layout, v, pol


# One BFS-verified case in the default tier (the full 1Dlhb domain: box +
# blocker); host-side BFS over the product state space is ~30 s/case on
# the CI runner, so the other families/seed variations run in -m slow.
CASES = [
    ("MiniGrid-ObstructedMaze-1Dlhb-v0", 0),
]
CASES_SLOW = [
    ("MiniGrid-BlockedUnlockPickup-v0", 0),
    ("MiniGrid-ObstructedMaze-1Dlhb-v0", 3),
    ("MiniGrid-ObstructedMaze-1Dlh-v0", 1),  # box, no blocker
    ("MiniGrid-BlockedUnlockPickup-v0", 5),
]


@pytest.mark.parametrize("env_id,seed", CASES)
def test_obstructed_vi_matches_bfs(env_id, seed):
    ref_env, state, layout, v, _ = _solve_from_reference(env_id, seed)
    got = float(
        obstructed_steps_to_go(obstructed_state_value(v, layout, state), GAMMA)
    )
    want = bfs_optimal_steps(ref_env)
    assert got == want, f"{env_id} seed={seed}: VI={got} BFS={want}"
    ref_env.close()


@pytest.mark.slow
@pytest.mark.parametrize("env_id,seed", CASES_SLOW)
def test_obstructed_vi_matches_bfs_slow(env_id, seed):
    test_obstructed_vi_matches_bfs(env_id, seed)


@pytest.mark.parametrize(
    "env_id,seed", [("MiniGrid-ObstructedMaze-1Dlhb-v0", 2)]
)
def test_obstructed_greedy_rollout_realizes_vi(env_id, seed):
    """The greedy VI policy driven through OUR device env (box toggle, ball
    pickup/drop, unlock) must terminate with positive reward in exactly the
    VI-predicted number of steps."""
    ref_env, state, layout, v, pol = _solve_from_reference(env_id, seed)
    dist = float(
        obstructed_steps_to_go(obstructed_state_value(v, layout, state), GAMMA)
    )
    assert np.isfinite(dist)

    env = mgtpu.make(env_id)
    step = jax.jit(env.step)
    ga = jax.jit(obstructed_greedy_action)
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
