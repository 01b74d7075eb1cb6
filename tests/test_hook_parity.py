"""Trajectory parity for envs with step overrides (reward/termination hooks).

Unlike test_step_parity (which drives the bare base transition), this drives
our full ``Environment.step`` — including action remapping and pre/post
hooks — against the reference env subclasses, after snapshotting the
reference's episode constants (target positions etc.) into ``state.aux``.
Restricted to deterministic-transition envs; DynamicObstacles (stochastic
per-step world dynamics) gets its own behavioral tests.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import minigrid_dynamicprogramming_tpu as mgtpu
from minigrid_dynamicprogramming_tpu.utils.parity import (
    aux_from_reference,
    state_from_reference,
)

from .oracle import action_script, make_reference_env

HOOK_ENVS = [
    "MiniGrid-Fetch-5x5-N2-v0",
    "MiniGrid-Fetch-8x8-N3-v0",
    "MiniGrid-GoToDoor-5x5-v0",
    "MiniGrid-GoToDoor-8x8-v0",
    "MiniGrid-GoToObject-6x6-N2-v0",
    "MiniGrid-PutNear-6x6-N2-v0",
    "MiniGrid-PutNear-8x8-N3-v0",
    "MiniGrid-RedBlueDoors-6x6-v0",
    "MiniGrid-MemoryS7-v0",
    "MiniGrid-MemoryS13-v0",
    "MiniGrid-DistShift1-v0",
    "MiniGrid-DistShift2-v0",
    "MiniGrid-LavaGapS5-v0",
    "MiniGrid-LavaCrossingS9N2-v0",
    "MiniGrid-SimpleCrossingS9N1-v0",
    "MiniGrid-LockedRoom-v0",
    "MiniGrid-Playground-v0",
    "MiniGrid-KeyCorridorS3R2-v0",
    "MiniGrid-KeyCorridorS6R3-v0",
    "MiniGrid-Unlock-v0",
    "MiniGrid-UnlockPickup-v0",
    "MiniGrid-BlockedUnlockPickup-v0",
    "MiniGrid-ObstructedMaze-1Dlhb-v0",
    "MiniGrid-ObstructedMaze-2Dlh-v0",
    "MiniGrid-ObstructedMaze-Full-v0",
    "MiniGrid-ObstructedMaze-Full-v1",
    "MiniGrid-MultiRoom-N2-S4-v0",
    "MiniGrid-MultiRoom-N6-v0",
]


@pytest.mark.parametrize("env_id", HOOK_ENVS)
@pytest.mark.parametrize("seed", [0, 5])
def test_full_step_parity(env_id, seed, n_steps=150):
    ref_env, ref_obs = make_reference_env(env_id, seed)
    env = mgtpu.make(env_id)
    state = state_from_reference(ref_env)
    state = aux_from_reference(ref_env, state)

    step_fn = jax.jit(env.step)
    obs0 = jax.jit(env.observation)(state)
    np.testing.assert_array_equal(
        np.asarray(obs0["image"]),
        ref_obs["image"],
        err_msg=f"{env_id} seed={seed} reset obs",
    )

    rng = np.random.default_rng(seed + 99)
    acts = action_script(rng, n_steps)
    key = jax.random.PRNGKey(0)
    for t, a in enumerate(acts):
        ref_obs, ref_r, ref_term, ref_trunc, _ = ref_env.step(int(a))
        key, k = jax.random.split(key)
        obs, state, r, term, trunc, _ = step_fn(k, state, jnp.asarray(int(a)))
        ctx = f"{env_id} seed={seed} t={t} a={int(a)}"
        np.testing.assert_array_equal(
            np.asarray(obs["image"]), ref_obs["image"], err_msg=ctx
        )
        assert bool(ref_term) == bool(term), ctx
        assert bool(ref_trunc) == bool(trunc), ctx
        np.testing.assert_allclose(
            float(r), float(ref_r), atol=1e-6, err_msg=ctx
        )
        if ref_term or ref_trunc:
            break
    ref_env.close()
