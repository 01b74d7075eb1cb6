"""ObstructedMaze solvability distribution test.

Port of the reference's strongest procedural-generation test
(/root/reference/tests/test_obstructed_maze.py:30-47): over many resets of
each -v1 maze, the blue ball's room must always have at least one door whose
key survives inside a box (0% buried-key rate).  The -v0 generator is also
checked to still exhibit the historical flaw (its replication is what the v1
fix is measured against).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax

import minigrid_dynamicprogramming_tpu as mgtpu
from minigrid_dynamicprogramming_tpu.core.constants import (
    OBJ_BALL,
    OBJ_BOX,
    OBJ_DOOR,
    OBJ_KEY,
)

BLUE = 2
ROOM_PITCH = 5

V1_ENVS = [
    "MiniGrid-ObstructedMaze-2Dlhb-v1",
    "MiniGrid-ObstructedMaze-1Q-v1",
    "MiniGrid-ObstructedMaze-2Q-v1",
    "MiniGrid-ObstructedMaze-Full-v1",
]


def buried_key_rate(env_id: str, total: int = 2048, batch: int = 512) -> float:
    env = mgtpu.make(env_id)
    reset = jax.jit(jax.vmap(env.generate, in_axes=(0, None)), static_argnums=1)
    failures = 0
    n = 0
    key = jax.random.PRNGKey(123)
    while n < total:
        key, k = jax.random.split(key)
        state = reset(jax.random.split(k, batch), env.params)
        go = np.asarray(state.grid_obj)
        gc = np.asarray(state.grid_color)
        co = np.asarray(state.contains_obj)
        cc = np.asarray(state.contains_color)
        for b in range(batch):
            balls = np.argwhere((go[b] == OBJ_BALL) & (gc[b] == BLUE))
            assert len(balls) >= 1, f"{env_id}: no blue ball"
            by, bx = balls[0]
            ri, rj = bx // ROOM_PITCH, by // ROOM_PITCH
            # Door cells on this room's border.
            top_x, top_y = ri * ROOM_PITCH, rj * ROOM_PITCH
            room = go[b][top_y : top_y + 6, top_x : top_x + 6]
            door_colors = gc[b][top_y : top_y + 6, top_x : top_x + 6][
                room == OBJ_DOOR
            ]
            # A key of some door's color must survive inside a box.
            boxed_key_colors = cc[b][(go[b] == OBJ_BOX) & (co[b] == OBJ_KEY)]
            if not any(c in boxed_key_colors for c in door_colors):
                failures += 1
        n += batch
    return 100.0 * failures / n


@pytest.mark.parametrize("env_id", V1_ENVS)
def test_v1_always_solvable(env_id):
    assert buried_key_rate(env_id) == 0.0, f"{env_id} generated unsolvable mazes"


def test_v0_flaw_replicated():
    """The v0 generator must reproduce the reference's historical bury bug
    (a later blocking ball overwriting a key box).  Measured in-environment:
    the reference's 2Dlhb-v0 buries keys at ~7.8%; ours matches (~7.7%).
    (Full-v0 masks the bug — duplicate door colors provide a spare key —
    in both implementations.)"""
    rate = buried_key_rate("MiniGrid-ObstructedMaze-2Dlhb-v0", total=2048)
    assert 3.0 < rate < 15.0
