"""Visibility API (`in_view`/`agent_sees`) + the reference's cross-check
property test.

Ports /root/reference/tests/test_envs.py:121-143: over 500 random steps of
DoorKey-6x6, ``agent_sees(goal)`` must agree with "a green goal appears in
the decoded observation image" — an independent path through
get_view_coords + the occlusion mask vs the encoded obs.
"""

from __future__ import annotations

import jax
import numpy as np
import pytest

import minigrid_dynamicprogramming_tpu as mgtpu
from minigrid_dynamicprogramming_tpu.core.constants import (
    COLOR_GREEN,
    OBJ_GOAL,
)
from minigrid_dynamicprogramming_tpu.ops.obs import (
    agent_sees,
    get_view_coords,
    in_view,
)


@pytest.mark.parametrize("env_id", ["MiniGrid-DoorKey-6x6-v0"])
def test_agent_sees_matches_decoded_obs(env_id):
    env = mgtpu.make(env_id)
    p = env.params
    goal = (p.width - 2, p.height - 2)

    reset = jax.jit(env.reset)
    step = jax.jit(env.step)
    sees = jax.jit(lambda s: agent_sees(p, s, goal[0], goal[1]))

    key = jax.random.PRNGKey(0)
    key, k = jax.random.split(key)
    obs, state = reset(k)
    for _ in range(500):
        key, ka, ks, kr = jax.random.split(key, 4)
        a = jax.random.randint(ka, (), 0, env.action_dim)
        obs, state, r, term, trunc, _ = step(ks, state, a)

        img = np.asarray(obs["image"])
        goal_visible = bool(
            ((img[..., 0] == OBJ_GOAL) & (img[..., 1] == COLOR_GREEN)).any()
        )
        assert bool(sees(state)) == goal_visible
        if bool(term) or bool(trunc):
            obs, state = reset(kr)


def test_view_coords_roundtrip():
    """get_view_coords inverts the obs gather: for every in-view world cell,
    the obs image at (vx, vy) equals the world cell (or the occlusion mask
    hides it).  Checks all four directions."""
    env = mgtpu.make("MiniGrid-Empty-8x8-v0")
    p = env.params
    obs, state = jax.jit(env.reset)(jax.random.PRNGKey(3))
    for d in range(4):
        s = state.replace(agent_dir=np.int32(d))
        img = np.asarray(jax.jit(env.observation)(s)["image"])
        grid_obj = np.asarray(s.grid_obj)
        for y in range(p.height):
            for x in range(p.width):
                vx, vy = get_view_coords(p, s, x, y)
                vx, vy = int(vx), int(vy)
                inside = 0 <= vx < p.agent_view_size and 0 <= vy < p.agent_view_size
                assert inside == bool(in_view(p, s, x, y))
                if not inside or (vx, vy) == (p.agent_view_size // 2, p.agent_view_size - 1):
                    continue  # agent cell shows the carried object
                if img[vx, vy, 0] != 0:  # 0 = occluded/unseen
                    assert img[vx, vy, 0] == grid_obj[y, x], (d, x, y, vx, vy)


def test_agent_sees_is_false_for_empty_and_out_of_view():
    env = mgtpu.make("MiniGrid-Empty-8x8-v0")
    p = env.params
    _, state = jax.jit(env.reset)(jax.random.PRNGKey(1))
    # (0, 0) corner wall behind the agent at (1,1) facing right: out of view.
    state = state.replace(
        agent_pos=np.asarray([1, 1], dtype=np.int32), agent_dir=np.int32(0)
    )
    assert not bool(agent_sees(p, state, 0, 0))
    # Empty world cells never "agent_sees" (decoded obs cell would be None).
    assert not bool(agent_sees(p, state, 2, 1))
