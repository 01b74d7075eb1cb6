"""Parity of the lane-major (batch-last) fast path vs the vmapped path.

The lane kernels (parallel/lanes.py) re-lay-out the step/obs math for TPU
lane density; semantics must be bit-identical to the vmapped reference
kernels (ops/step.py, ops/obs.py), which are themselves parity-tested
against /root/reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import minigrid_dynamicprogramming_tpu as mgtpu
from minigrid_dynamicprogramming_tpu.ops.obs import gen_obs_image
from minigrid_dynamicprogramming_tpu.ops.step import apply_truncation, base_step
from minigrid_dynamicprogramming_tpu.parallel import lanes

LANE_ENVS = [
    "MiniGrid-Empty-8x8-v0",
    "MiniGrid-DoorKey-8x8-v0",
    "MiniGrid-FourRooms-v0",
    "MiniGrid-LavaGapS7-v0",
    "MiniGrid-MultiRoom-N4-S5-v0",
]

BATCH = 64
STEPS = 60


def _batched_state(env, key, batch):
    keys = jax.random.split(key, batch)
    return jax.vmap(env.generate, in_axes=(0, None))(keys, env.params)


@pytest.mark.parametrize("env_id", LANE_ENVS)
def test_roundtrip(env_id):
    env = mgtpu.make(env_id)
    state = _batched_state(env, jax.random.PRNGKey(0), BATCH)
    back = lanes.from_lanes(env.params, lanes.to_lanes(state))
    for name in state.__dataclass_fields__:
        np.testing.assert_array_equal(
            np.asarray(getattr(state, name)),
            np.asarray(getattr(back, name)),
            err_msg=name,
        )


@pytest.mark.parametrize("env_id", LANE_ENVS)
def test_step_obs_parity(env_id):
    """Lane step+obs == vmapped step+obs over a random action trajectory."""
    env = mgtpu.make(env_id)
    assert lanes.supports_lanes(env)
    state = _batched_state(env, jax.random.PRNGKey(1), BATCH)
    ls = lanes.to_lanes(state)

    vstep = jax.jit(jax.vmap(base_step, in_axes=(None, 0, 0)))
    vtrunc = jax.jit(jax.vmap(apply_truncation, in_axes=(None, 0)))
    vobs = jax.jit(jax.vmap(gen_obs_image, in_axes=(None, 0)))
    lstep = jax.jit(lanes.step_lanes, static_argnums=0)
    lobs = jax.jit(lanes.obs_image_lanes, static_argnums=0)

    key = jax.random.PRNGKey(2)
    for t in range(STEPS):
        key, k = jax.random.split(key)
        actions = jax.random.randint(k, (BATCH,), 0, 7)

        state, reward_v, term_v = vstep(env.params, state, actions)
        state = vtrunc(env.params, state)
        img_v = vobs(env.params, state)

        ls, reward_l, term_l = lstep(env.params, ls, actions)
        img_l = lobs(env.params, ls)

        np.testing.assert_array_equal(np.asarray(term_v), np.asarray(term_l))
        np.testing.assert_allclose(
            np.asarray(reward_v), np.asarray(reward_l), rtol=0, atol=0
        )
        np.testing.assert_array_equal(np.asarray(img_v), np.asarray(img_l))
        np.testing.assert_array_equal(
            np.asarray(state.truncated), np.asarray(ls.truncated)
        )

    back = lanes.from_lanes(env.params, ls)
    for name in ("grid_obj", "grid_color", "grid_state", "agent_dir",
                 "carrying_obj", "carrying_color", "step_count"):
        np.testing.assert_array_equal(
            np.asarray(getattr(state, name)),
            np.asarray(getattr(back, name)),
            err_msg=name,
        )
    np.testing.assert_array_equal(
        np.asarray(state.agent_pos),
        np.asarray(jnp.stack([ls.agent_x, ls.agent_y], axis=-1)),
    )


def test_lane_rollout_runs_and_resets():
    env = mgtpu.make("MiniGrid-DoorKey-5x5-v0")
    res = lanes.lane_rollout(
        env, jax.random.PRNGKey(3), 32, horizon=300, autoreset="pool",
        pool_rounds=3,
    )
    assert int(res.episodes) > 0  # max_steps=250 < 300 forces resets
    assert int(res.steps) == 32 * 300
    assert int(res.obs_checksum) != 0
    # step_count must have been reset below the horizon for done slots
    assert int(res.final_state.step_count.max()) <= 300


def test_lane_rollout_cached_mode():
    env = mgtpu.make("MiniGrid-Empty-5x5-v0")
    res = lanes.lane_rollout(
        env, jax.random.PRNGKey(4), 16, horizon=64, autoreset="cached"
    )
    assert int(res.steps) == 16 * 64
