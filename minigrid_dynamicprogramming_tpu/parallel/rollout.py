"""Batched rollouts with on-device auto-reset.

The reference has no vectorized rollout machinery at all — its only
vectorization is Gymnasium's ``SyncVectorEnv`` exercised once in a smoke test
(/root/reference/tests/test_envs.py:318-330).  Here the rollout is the
throughput spine of the framework: a ``lax.scan`` over a vmapped step with a
done-masked reset, so tens of thousands of environments advance in lockstep
per chip with zero host involvement.

Auto-reset modes:

* ``"regen"``  — on done, regenerate a fresh layout from the env's PRNG key
  (exact episode-distribution semantics; pays generation cost every step
  because both branches of the select are computed).
* ``"cached"`` — on done, restore the episode's initial state (zero
  generation cost; each env slot replays its own layout, the standard
  trick for fixed-layout training loops).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from minigrid_dynamicprogramming_tpu.core.env import Environment
from minigrid_dynamicprogramming_tpu.core.state import EnvState


def _where_done(done, a, b):
    """Select a (reset) vs b (stepped) per-env; done is scalar per env."""
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(
            done.reshape(done.shape + (1,) * (x.ndim - done.ndim)), x, y
        ),
        a,
        b,
    )


def make_autoreset_step(env: Environment, mode: str = "regen"):
    """Returns ``step(key, state, init_state, action) ->
    (obs, state, reward, term, trunc)`` with per-env auto-reset applied.

    ``init_state`` is each env slot's episode-start state (used by
    ``mode="cached"``; pass the stepped state for ``mode="regen"``).
    Per-env (unbatched): vmap it.
    """

    def step(key, state: EnvState, init_state: Optional[EnvState], action):
        k_step, k_reset = jax.random.split(key)
        obs, ns, reward, term, trunc, _ = env.step(k_step, state, action)
        done = term | trunc
        if mode == "regen":
            fresh = env.generate(k_reset, env.params)
        elif mode == "cached":
            fresh = init_state.replace(rng=k_reset)
        else:
            raise ValueError(f"unknown autoreset mode {mode!r}")
        ns = _where_done(done, fresh, ns)
        obs = {
            "image": jnp.where(done, env.observation(fresh)["image"], obs["image"]),
            "direction": jnp.where(done, fresh.agent_dir, obs["direction"]),
            "mission": jnp.where(done, fresh.mission, obs["mission"]),
        }
        return obs, ns, reward, term, trunc

    return step


def make_pool_autoreset_step(env: Environment):
    """Pool auto-reset in the vmapped (batch-first) layout.

    ``pool_env`` holds one slot's pregenerated layouts with a leading
    rounds axis ``(R, ...)``; the k-th reset of the slot draws round
    ``k % R``, giving fresh layouts per episode at gather cost instead of
    paying full regeneration every step (the ``"regen"`` trap this module's
    header describes).  Mirrors the lane path's pool mode
    (parallel/lanes.py ``_select_pool``), except the reset state's ``rng``
    is refreshed from the step key so replayed rounds do not replay their
    episode randomness.

    Per-env signature (vmap with ``in_axes=(0, 0, 1, 0, 0)``):
    ``step(key, state, pool_env, reset_count, action) ->
    (obs, state, reward, term, trunc, reset_count)``.
    """

    def step(key, state: EnvState, pool_env, reset_count, action):
        k_step, k_reset = jax.random.split(key)
        obs, ns, reward, term, trunc, _ = env.step(k_step, state, action)
        done = term | trunc
        new_count = reset_count + done.astype(jnp.int32)
        rounds = jax.tree_util.tree_leaves(pool_env)[0].shape[0]
        fresh = jax.tree_util.tree_map(
            lambda x: x[new_count % rounds], pool_env
        )
        fresh = fresh.replace(rng=k_reset)
        ns = _where_done(done, fresh, ns)
        obs = {
            "image": jnp.where(done, env.observation(fresh)["image"], obs["image"]),
            "direction": jnp.where(done, fresh.agent_dir, obs["direction"]),
            "mission": jnp.where(done, fresh.mission, obs["mission"]),
        }
        return obs, ns, reward, term, trunc, new_count

    return step


class RolloutResult(NamedTuple):
    final_state: EnvState
    total_reward: jnp.ndarray  # () f32 — summed over batch and time
    episodes: jnp.ndarray  # () i32 — number of terminations+truncations
    steps: jnp.ndarray  # () i32 — total env steps taken
    obs_checksum: jnp.ndarray  # () u32 — wrap-around tag over every obs image;
    # folded through the scan so XLA cannot dead-code-eliminate the obs
    # encoder (the reported steps/s includes obs generation, like the
    # reference's step).


def random_policy(num_actions: int = 7):
    def policy(key, obs):
        batch = obs["direction"].shape
        return jax.random.randint(key, batch, 0, num_actions)

    return policy


@partial(jax.jit, static_argnums=(0, 2, 4, 5))
def rollout(
    env: Environment,
    key: jax.Array,
    batch_size: int,
    init_state: Optional[EnvState] = None,
    horizon: int = 128,
    autoreset: str = "regen",
) -> RolloutResult:
    """Run ``horizon`` lockstep steps of ``batch_size`` envs under a uniform
    random policy, entirely on device. Used by the benchmark and smoke tests;
    training loops use :func:`make_autoreset_step` directly with their own
    policy."""
    k_init, k_scan = jax.random.split(key)
    if init_state is None:
        init_keys = jax.random.split(k_init, batch_size)
        init_state = jax.vmap(env.generate, in_axes=(0, None))(
            init_keys, env.params
        )
    step = jax.vmap(make_autoreset_step(env, autoreset))
    policy = random_policy()

    def body(carry, key_t):
        state = carry
        k_act, k_step = jax.random.split(key_t)
        actions = jax.random.randint(k_act, (batch_size,), 0, 7)
        step_keys = jax.random.split(k_step, batch_size)
        obs, state, reward, term, trunc = step(
            step_keys, state, init_state, actions
        )
        done = term | trunc
        checksum = obs["image"].astype(jnp.uint32).sum(dtype=jnp.uint32)
        return state, (reward.sum(), done.sum(), checksum)

    final_state, (rewards, dones, checksums) = jax.lax.scan(
        body, init_state, jax.random.split(k_scan, horizon)
    )
    return RolloutResult(
        final_state=final_state,
        total_reward=rewards.sum(),
        episodes=dones.sum().astype(jnp.int32),
        steps=jnp.asarray(batch_size * horizon, dtype=jnp.int32),
        obs_checksum=checksums.sum(dtype=jnp.uint32),
    )
