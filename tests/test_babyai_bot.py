"""The oracle bot must solve every BabyAI level of this framework.

TPU-framework analog of the reference's strongest behavioral test
(/root/reference/tests/test_baby_ai_bot.py:24-58): for each registered
BabyAI id, generate an episode on device, let the host-side
:class:`BabyAIBot` plan, and require verifier success within 240 steps
(retrying a few seeds, as the reference does).  Unlike the reference test we
also assert the terminal reward is positive — termination alone could be a
verifier *failure*.

The known-unsolvable bonus levels match the reference list
(baby_ai_bot.py:564-570 / test_baby_ai_bot.py:9-14).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import minigrid_dynamicprogramming_tpu as mgtpu
from minigrid_dynamicprogramming_tpu.utils.babyai_bot import (
    BabyAIBot,
    DisappearedBoxError,
)

BROKEN_BONUS_ENVS = {
    "BabyAI-PutNextS5N2Carrying-v0",
    "BabyAI-PutNextS6N3Carrying-v0",
    "BabyAI-PutNextS7N4Carrying-v0",
    "BabyAI-KeyInBox-v0",
}

BABYAI_ENVS = [
    i
    for i in mgtpu.registered_ids()
    if i.startswith("BabyAI-") and i not in BROKEN_BONUS_ENVS
]

MAX_STEPS = 240
MAX_SEEDS = 8


@pytest.mark.parametrize("env_id", BABYAI_ENVS)
def test_bot_solves_level(env_id):
    env = mgtpu.make(env_id)
    reset_fn = jax.jit(env.reset)
    step_fn = jax.jit(env.step)

    for seed in range(MAX_SEEDS):
        _, state = reset_fn(jax.random.PRNGKey(seed))
        bot = BabyAIBot(env, state)
        key = jax.random.PRNGKey(seed + 1000)
        last_action = None
        solved = False
        try:
            for _ in range(MAX_STEPS):
                action = bot.replan(state, last_action)
                key, k = jax.random.split(key)
                _, state, reward, term, trunc, _ = step_fn(
                    k, state, jnp.asarray(action)
                )
                last_action = action
                if bool(term):
                    solved = float(reward) > 0
                    break
                if bool(trunc):
                    break
        except (DisappearedBoxError, AssertionError):
            continue  # this seed confused the bot; try the next one
        if solved:
            return
    pytest.fail(f"bot failed to solve {env_id} within {MAX_SEEDS} seeds")
