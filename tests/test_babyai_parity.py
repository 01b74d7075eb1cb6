"""BabyAI verifier trajectory parity.

Reference ``RoomGridLevel`` envs are reset, snapshotted (grid + instruction
tree + verifier identity sets -> mission codes + mark planes), then both
sides are driven with identical action scripts: observations, rewards,
termination and truncation must agree bit-exactly at every step.  This
exercises the flattened-instruction verifier (envs/babyai/core.py) against
the reference's Instr state machines (verifier.py)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import minigrid_dynamicprogramming_tpu as mgtpu
from minigrid_dynamicprogramming_tpu.utils.parity import (
    babyai_from_reference,
    state_from_reference,
)

from .oracle import action_script, make_reference_env

BABYAI_ENVS = [
    "BabyAI-GoToRedBallGrey-v0",
    "BabyAI-GoToRedBall-v0",
    "BabyAI-GoToRedBallNoDists-v0",
    "BabyAI-GoToObj-v0",
    "BabyAI-GoToObjS4-v0",
    "BabyAI-GoToLocal-v0",
    "BabyAI-GoToLocalS6N3-v0",
    "BabyAI-GoTo-v0",
    "BabyAI-GoToOpen-v0",
    "BabyAI-GoToObjMazeS4-v0",
    "BabyAI-GoToImpUnlock-v0",
    "BabyAI-GoToRedBlueBall-v0",
    "BabyAI-GoToDoor-v0",
    "BabyAI-GoToObjDoor-v0",
    "BabyAI-Open-v0",
    "BabyAI-OpenRedDoor-v0",
    "BabyAI-OpenDoor-v0",
    "BabyAI-OpenDoorLoc-v0",
    "BabyAI-OpenDoorDebug-v0",
    "BabyAI-OpenTwoDoors-v0",
    "BabyAI-OpenRedBlueDoorsDebug-v0",
    "BabyAI-OpenDoorsOrderN4-v0",
    "BabyAI-OpenDoorsOrderN2Debug-v0",
    "BabyAI-Pickup-v0",
    "BabyAI-UnblockPickup-v0",
    "BabyAI-PickupDist-v0",
    "BabyAI-PickupDistDebug-v0",
    "BabyAI-PickupAbove-v0",
    "BabyAI-PutNextLocalS5N3-v0",
    "BabyAI-PutNextS5N2-v0",
    "BabyAI-PutNextS5N2Carrying-v0",
    "BabyAI-Unlock-v0",
    "BabyAI-UnlockLocal-v0",
    "BabyAI-UnlockLocalDist-v0",
    "BabyAI-KeyInBox-v0",
    "BabyAI-UnlockPickup-v0",
    "BabyAI-UnlockPickupDist-v0",
    "BabyAI-BlockedUnlockPickup-v0",
    "BabyAI-UnlockToUnlock-v0",
    "BabyAI-ActionObjDoor-v0",
    "BabyAI-FindObjS5-v0",
    "BabyAI-KeyCorridorS3R2-v0",
    "BabyAI-KeyCorridor-v0",
    "BabyAI-OneRoomS8-v0",
    "BabyAI-MoveTwoAcrossS5N2-v0",
    "BabyAI-GoToSeq-v0",
    "BabyAI-GoToSeqS5R2-v0",
    "BabyAI-PickupLoc-v0",
    "BabyAI-Synth-v0",
    "BabyAI-SynthLoc-v0",
    "BabyAI-SynthSeq-v0",
    "BabyAI-MiniBossLevel-v0",
    "BabyAI-BossLevel-v0",
    "BabyAI-BossLevelNoUnlock-v0",
]


@pytest.mark.parametrize("env_id", BABYAI_ENVS)
@pytest.mark.parametrize("seed", [0])
def test_babyai_step_parity(env_id, seed, n_steps=200):
    ref_env, ref_obs = make_reference_env(env_id, seed)
    env = mgtpu.make(env_id)
    state = state_from_reference(ref_env)
    state = babyai_from_reference(ref_env, state)

    assert env.mission_text(np.asarray(state.mission)) == ref_env.unwrapped.mission

    step_fn = jax.jit(env.step)
    obs0 = jax.jit(env.observation)(state)
    if "Carrying" not in env_id:
        # PutNext*Carrying's reference reset obs is computed BEFORE the
        # start-carrying mutation (putnext.py:192-201) and is stale w.r.t.
        # the actual state; step obs below still must match exactly.
        np.testing.assert_array_equal(
            np.asarray(obs0["image"]), ref_obs["image"],
            err_msg=f"{env_id} seed={seed} reset obs",
        )

    rng = np.random.default_rng(seed + 123)
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
        np.testing.assert_allclose(float(r), float(ref_r), atol=1e-6, err_msg=ctx)
        if ref_term or ref_trunc:
            break
    ref_env.close()


@pytest.mark.slow
@pytest.mark.parametrize("env_id", BABYAI_ENVS)
@pytest.mark.parametrize("seed", [5, 11])
def test_babyai_step_parity_deep(env_id, seed):
    test_babyai_step_parity(env_id, seed)
