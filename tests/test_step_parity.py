"""Bit-exact transition/observation parity against the reference.

Strategy (modeled on the reference's own determinism test,
/root/reference/tests/test_envs.py:48-103): reset a reference env under a
seed, snapshot its world into SoA state, then drive BOTH implementations with
the same action script and assert identical observation images, directions,
rewards and termination flags at every step.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minigrid_dynamicprogramming_tpu.core.env import Environment
from minigrid_dynamicprogramming_tpu.core.state import EnvParams
from minigrid_dynamicprogramming_tpu.ops.obs import gen_obs_image
from minigrid_dynamicprogramming_tpu.ops.step import apply_truncation, base_step
from minigrid_dynamicprogramming_tpu.utils.parity import (
    params_from_reference,
    state_from_reference,
)

from .oracle import action_script, make_reference_env

PARITY_ENVS = [
    "MiniGrid-Empty-5x5-v0",
    "MiniGrid-Empty-8x8-v0",
    "MiniGrid-Empty-Random-6x6-v0",
    "MiniGrid-DoorKey-5x5-v0",
    "MiniGrid-DoorKey-8x8-v0",
    "MiniGrid-FourRooms-v0",
]


def run_parity(env_id: str, seed: int, n_steps: int = 120):
    ref_env, ref_obs = make_reference_env(env_id, seed)
    params = params_from_reference(ref_env)
    state = state_from_reference(ref_env)

    def _step(s, a):
        s2, r, term = base_step(params, s, a)
        s2 = apply_truncation(params, s2)
        return s2, r, term

    step_fn = jax.jit(_step)
    obs_fn = jax.jit(lambda s: gen_obs_image(params, s))

    # Initial observation parity.
    ours = np.asarray(obs_fn(state))
    np.testing.assert_array_equal(
        ours, ref_obs["image"], err_msg=f"{env_id} seed={seed} reset obs"
    )

    rng = np.random.default_rng(seed + 1000)
    acts = action_script(rng, n_steps)

    for t, a in enumerate(acts):
        ref_obs, ref_r, ref_term, ref_trunc, _ = ref_env.step(int(a))
        state, r, term = step_fn(state, jnp.asarray(int(a)))
        ours_img = np.asarray(obs_fn(state))
        ctx = f"{env_id} seed={seed} t={t} a={int(a)}"
        np.testing.assert_array_equal(ours_img, ref_obs["image"], err_msg=ctx)
        assert int(ref_obs["direction"]) == int(state.agent_dir), ctx
        assert bool(ref_term) == bool(term), ctx
        assert bool(ref_trunc) == bool(state.truncated), ctx
        np.testing.assert_allclose(float(r), float(ref_r), atol=1e-6, err_msg=ctx)
        if ref_term or ref_trunc:
            break
    ref_env.close()


@pytest.mark.parametrize("env_id", PARITY_ENVS)
@pytest.mark.parametrize("seed", [0, 7])
def test_step_parity(env_id, seed):
    run_parity(env_id, seed)


def test_pickup_drop_toggle_parity():
    """Longer interaction-heavy script on DoorKey to exercise pickup, drop,
    unlock and door toggling."""
    for seed in range(4):
        run_parity("MiniGrid-DoorKey-6x6-v0", seed, n_steps=300)
