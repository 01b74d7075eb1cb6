"""MissionSpace analog (core/mission.py) and BABYAI_DONE_ACTIONS mode.

Mission-space cases are ported from the reference's own suite
(/root/reference/tests/test_envs.py:262-306); family spaces are checked by
membership of the reference envs' actual reset missions.  The done-actions
tests drive the reference verifier (module flag) and our device verifier
(params flag) through the same episode and require identical outcomes.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import minigrid_dynamicprogramming_tpu as mgtpu
from minigrid_dynamicprogramming_tpu.core.mission import (
    MissionSpace,
    mission_space_for,
)

from .oracle import make_reference_env


def test_mission_space_placeholders():
    space = MissionSpace(
        mission_func=lambda color, obj_type: f"Get the {color} {obj_type}.",
        ordered_placeholders=[["green", "red"], ["ball", "key"]],
    )
    assert space.contains("Get the green ball.")
    assert space.contains("Get the red key.")
    assert not space.contains("Get the purple box.")
    # inverted placeholders
    assert not space.contains("Get the key red.")
    # extra repeated placeholders
    assert not space.contains("Get the key red key.")


def test_mission_space_contained_placeholders():
    space = MissionSpace(
        mission_func=lambda get_syntax, obj_type: f"{get_syntax} {obj_type}.",
        ordered_placeholders=[
            ["go get the", "get the", "go fetch the", "fetch the"],
            ["ball", "key"],
        ],
    )
    assert space.contains("get the ball.")
    assert space.contains("go get the key.")
    assert space.contains("go fetch the ball.")


def test_mission_space_repeated_placeholders():
    space = MissionSpace(
        mission_func=lambda get_syntax, c1, t1, c2, t2: (
            f"{get_syntax} {c1} {t1} and the {c2} {t2}."
        ),
        ordered_placeholders=[
            ["go get the", "get the", "go fetch the", "fetch the"],
            ["green", "red"],
            ["ball", "key"],
            ["green", "red"],
            ["ball", "key"],
        ],
    )
    assert space.contains("get the green key and the green key.")
    assert space.contains("go fetch the red ball and the green key.")


def test_mission_space_sample_and_eq():
    space = MissionSpace(
        mission_func=lambda color: f"go to the {color} door",
        ordered_placeholders=[["red", "blue"]],
        seed=0,
    )
    for _ in range(8):
        assert space.contains(space.sample())
    same = MissionSpace(
        mission_func=lambda color: f"go to the {color} door",
        ordered_placeholders=[["blue", "red"]],
    )
    assert space == same
    fixed = MissionSpace(mission_func=lambda: "reach the goal")
    assert fixed.sample() == "reach the goal"
    assert fixed.contains("reach the goal")
    assert not fixed.contains("reach goal")
    assert space != fixed


# One id per family: the reference env's actual mission string must be a
# member of our space for that id.
FAMILY_IDS = [
    "MiniGrid-Empty-5x5-v0",
    "MiniGrid-DoorKey-5x5-v0",
    "MiniGrid-FourRooms-v0",
    "MiniGrid-LavaCrossingS9N1-v0",
    "MiniGrid-SimpleCrossingS9N1-v0",
    "MiniGrid-DistShift1-v0",
    "MiniGrid-LavaGapS5-v0",
    "MiniGrid-Dynamic-Obstacles-5x5-v0",
    "MiniGrid-Fetch-5x5-N2-v0",
    "MiniGrid-GoToDoor-5x5-v0",
    "MiniGrid-GoToObject-6x6-N2-v0",
    "MiniGrid-PutNear-6x6-N2-v0",
    "MiniGrid-KeyCorridorS3R1-v0",
    "MiniGrid-LockedRoom-v0",
    "MiniGrid-MemoryS7-v0",
    "MiniGrid-MultiRoom-N2-S4-v0",
    "MiniGrid-Playground-v0",
    "MiniGrid-RedBlueDoors-6x6-v0",
    "MiniGrid-Unlock-v0",
    "MiniGrid-UnlockPickup-v0",
    "MiniGrid-BlockedUnlockPickup-v0",
    "MiniGrid-ObstructedMaze-1Dlhb-v0",
    "BabyAI-GoToRedBallGrey-v0",
    "BabyAI-BossLevel-v0",
]


@pytest.mark.parametrize("env_id", FAMILY_IDS)
def test_family_space_contains_reference_missions(env_id):
    space = mission_space_for(env_id)
    for seed in range(3):
        ref_env, obs = make_reference_env(env_id, seed)
        assert space.contains(ref_env.unwrapped.mission), (
            env_id,
            ref_env.unwrapped.mission,
        )
        ref_env.close()
    assert space.contains(space.sample())


def test_every_registered_id_has_a_space():
    for env_id in mgtpu.registered_ids():
        space = mgtpu.make(env_id).mission_space
        assert space.contains(space.sample()), env_id


# --- BABYAI_DONE_ACTIONS ----------------------------------------------------


def _snapshot(ref_env):
    from minigrid_dynamicprogramming_tpu.utils.parity import (
        babyai_from_reference,
        state_from_reference,
    )

    state = state_from_reference(ref_env)
    return babyai_from_reference(ref_env, state)


def _solving_actions(env_id, seed, max_steps=150):
    """Action list ending exactly at the verifier-success step (flag off)."""
    from minigrid_dynamicprogramming_tpu.utils.babyai_bot import BabyAIBot

    ref_env, _ = make_reference_env(env_id, seed)
    env = mgtpu.make(env_id)
    state = _snapshot(ref_env)
    ref_env.close()
    bot = BabyAIBot(env, state)
    step_fn = jax.jit(env.step)
    key = jax.random.PRNGKey(0)
    actions = []
    last = None
    for _ in range(max_steps):
        a = bot.replan(state, last)
        key, k = jax.random.split(key)
        _, state, r, term, trunc, _ = step_fn(k, state, jnp.asarray(a))
        actions.append(int(a))
        last = a
        if bool(term):
            assert float(r) > 0
            return actions
        assert not bool(trunc)
    raise AssertionError("bot did not solve the episode")


@pytest.mark.parametrize("seed", [0, 2])
def test_done_actions_mode_matches_reference(monkeypatch, seed):
    env_id = "BabyAI-GoToRedBallGrey-v0"
    actions = _solving_actions(env_id, seed)

    # Flip the mode on: reference reads a module global (verifier.py:25),
    # ours reads the env var at factory time.
    from minigrid.envs.babyai.core import verifier as V

    monkeypatch.setattr(V, "use_done_actions", True)
    monkeypatch.setenv("BABYAI_DONE_ACTIONS", "1")

    ref_env, _ = make_reference_env(env_id, seed)
    env = mgtpu.make(env_id)
    assert env.params.opt("done_actions") is True
    state = _snapshot(ref_env)
    step_fn = jax.jit(env.step)

    key = jax.random.PRNGKey(1)
    for t, a in enumerate(actions):
        _, ref_r, ref_term, ref_trunc, _ = ref_env.step(a)
        key, k = jax.random.split(key)
        _, state, r, term, trunc, _ = step_fn(k, state, jnp.asarray(a))
        # without a done action nothing terminates in this mode
        assert not (ref_term or ref_trunc), t
        assert not (bool(term) or bool(trunc)), t

    # done right after the satisfying step: success on both sides
    _, ref_r, ref_term, _, _ = ref_env.step(6)
    key, k = jax.random.split(key)
    _, state, r, term, _, _ = step_fn(k, state, jnp.asarray(6))
    assert ref_term and bool(term)
    assert float(ref_r) > 0 and float(r) > 0
    np.testing.assert_allclose(float(r), float(ref_r), rtol=1e-6)
    ref_env.close()


def test_done_actions_immediate_done_fails(monkeypatch):
    env_id = "BabyAI-GoToRedBallGrey-v0"
    from minigrid.envs.babyai.core import verifier as V

    monkeypatch.setattr(V, "use_done_actions", True)
    monkeypatch.setenv("BABYAI_DONE_ACTIONS", "1")

    ref_env, _ = make_reference_env(env_id, 1)
    env = mgtpu.make(env_id)
    state = _snapshot(ref_env)
    _, ref_r, ref_term, _, _ = ref_env.step(6)
    _, state, r, term, _, _ = jax.jit(env.step)(
        jax.random.PRNGKey(0), state, jnp.asarray(6)
    )
    assert ref_term and bool(term)
    assert float(ref_r) == 0.0 and float(r) == 0.0
    ref_env.close()
