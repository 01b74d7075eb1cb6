"""The oracle bot must solve every BabyAI level of this framework.

TPU-framework analog of the reference's strongest behavioral test
(/root/reference/tests/test_baby_ai_bot.py:24-58): for each registered
BabyAI id, generate an episode on device, let the host-side
:class:`BabyAIBot` plan, and require verifier success within 240 steps.
Unlike the reference test we also assert the terminal reward is positive —
termination alone could be a verifier *failure*.

Two tiers:

- ``test_bot_solves_level`` (default): the level must be solved within a few
  seeds — a fast smoke test, the reference's retry-seeds pattern.
- ``test_bot_solve_rate`` (``-m slow``): the *measured* per-level solve rate
  over 20 seeds must clear a 90% floor, with planner exceptions counted as
  failures — a regression from ~99% to a barely-retryable rate is caught
  here, where the retry pattern would hide it.

The known-unsolvable bonus levels match the reference list
(baby_ai_bot.py:564-570 / test_baby_ai_bot.py:9-14).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import pytest

import minigrid_dynamicprogramming_tpu as mgtpu
from minigrid_dynamicprogramming_tpu.utils.babyai_bot import (
    BabyAIBot,
    DisappearedBoxError,
    PlanThrashingError,
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

# The six heaviest levels (deep LevelGen missions: 23-44 s each, dominated
# by generator compile + long bot plans) run in the slow tier; the default
# tier still proves the bot on the other ~82 levels including a Synth and a
# GoToSeq representative.
HEAVY_BOT_ENVS = {
    "BabyAI-BossLevel-v0",
    "BabyAI-BossLevelNoUnlock-v0",
    "BabyAI-SynthSeq-v0",
    "BabyAI-MiniBossLevel-v0",
    "BabyAI-SynthLoc-v0",
    "BabyAI-SynthS5R2-v0",
}
FAST_BOT_ENVS = [i for i in BABYAI_ENVS if i not in HEAVY_BOT_ENVS]

MAX_STEPS = 240
MAX_SEEDS = 8
SOLVE_SEEDS = 20
SOLVE_FLOOR = 0.90

_BOT_EXCEPTIONS = (DisappearedBoxError, PlanThrashingError)


def run_bot_episode(env, reset_fn, step_fn, seed: int) -> bool:
    """One bot-driven episode; True iff the verifier terminated with
    positive reward.  Planner exceptions propagate to the caller."""
    _, state = reset_fn(jax.random.PRNGKey(seed))
    bot = BabyAIBot(env, state)
    key = jax.random.PRNGKey(seed + 1000)
    last_action = None
    for _ in range(MAX_STEPS):
        action = bot.replan(state, last_action)
        key, k = jax.random.split(key)
        _, state, reward, term, trunc, _ = step_fn(
            k, state, jnp.asarray(action)
        )
        last_action = action
        if bool(term):
            return float(reward) > 0
        if bool(trunc):
            return False
    return False


@pytest.mark.parametrize("env_id", FAST_BOT_ENVS)
def test_bot_solves_level(env_id):
    env = mgtpu.make(env_id)
    reset_fn = jax.jit(env.reset)
    step_fn = jax.jit(env.step)
    for seed in range(MAX_SEEDS):
        try:
            if run_bot_episode(env, reset_fn, step_fn, seed):
                return
        except _BOT_EXCEPTIONS:
            continue  # this seed confused the bot; the rate test measures how often
    pytest.fail(f"bot failed to solve {env_id} within {MAX_SEEDS} seeds")


@pytest.mark.slow
@pytest.mark.parametrize("env_id", sorted(HEAVY_BOT_ENVS))
def test_bot_solves_heavy_level(env_id):
    test_bot_solves_level(env_id)


@pytest.mark.slow
@pytest.mark.parametrize("env_id", BABYAI_ENVS)
def test_bot_solve_rate(env_id):
    """Measured solve rate over SOLVE_SEEDS seeds, exceptions = failures."""
    env = mgtpu.make(env_id)
    reset_fn = jax.jit(env.reset)
    step_fn = jax.jit(env.step)
    solved = 0
    failures = []
    for seed in range(SOLVE_SEEDS):
        try:
            ok = run_bot_episode(env, reset_fn, step_fn, seed)
            if not ok:
                failures.append((seed, "unsolved"))
        except _BOT_EXCEPTIONS as e:
            ok = False
            failures.append((seed, type(e).__name__))
        solved += int(ok)
    rate = solved / SOLVE_SEEDS
    assert rate >= SOLVE_FLOOR, (
        f"{env_id}: solve rate {rate:.0%} < {SOLVE_FLOOR:.0%} "
        f"({solved}/{SOLVE_SEEDS}); failures={failures}"
    )
