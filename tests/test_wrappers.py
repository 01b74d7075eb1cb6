"""Wrapper-suite parity vs the reference wrappers
(/root/reference/minigrid/wrappers.py), mirroring the reference's
tests/test_wrappers.py: per-wrapper semantic checks against seed-matched
states plus exact bonus arithmetic and NoDeath reward algebra."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import minigrid_dynamicprogramming_tpu as mgtpu
from minigrid_dynamicprogramming_tpu.wrappers import (
    ActionBonus,
    DictObservationSpaceWrapper,
    DirectionObsWrapper,
    FlatObsWrapper,
    FullyObsWrapper,
    ImgObsWrapper,
    NoDeath,
    OneHotPartialObsWrapper,
    PositionBonus,
    RGBImgObsWrapper,
    RGBImgPartialObsWrapper,
    StochasticActionWrapper,
    SymbolicObsWrapper,
    ViewSizeWrapper,
    WrapperState,
)
from minigrid_dynamicprogramming_tpu.utils.parity import (
    aux_from_reference,
    state_from_reference,
)

from .oracle import action_script, make_reference_env

OBS_ENVS = ["MiniGrid-Empty-5x5-v0", "MiniGrid-DoorKey-6x6-v0", "MiniGrid-Fetch-5x5-N2-v0"]


def _setup(env_id, seed):
    ref_env, ref_obs = make_reference_env(env_id, seed)
    env = mgtpu.make(env_id)
    state = state_from_reference(ref_env)
    state = aux_from_reference(ref_env, state)
    return ref_env, ref_obs, env, state


@pytest.mark.parametrize("env_id", OBS_ENVS)
def test_img_obs(env_id):
    ref_env, ref_obs, env, state = _setup(env_id, 1)
    w = ImgObsWrapper(env)
    mine = w.observation(env.observation(state), state)
    np.testing.assert_array_equal(np.asarray(mine), ref_obs["image"])
    ref_env.close()


@pytest.mark.parametrize("env_id", OBS_ENVS)
def test_one_hot(env_id):
    from minigrid.wrappers import OneHotPartialObsWrapper as RefW

    ref_env, ref_obs, env, state = _setup(env_id, 2)
    theirs = RefW(ref_env.unwrapped).observation(ref_obs)["image"]
    mine = OneHotPartialObsWrapper(env).observation(env.observation(state), state)
    np.testing.assert_array_equal(np.asarray(mine["image"]), theirs)
    ref_env.close()


@pytest.mark.parametrize("env_id", OBS_ENVS)
def test_fully_obs(env_id):
    from minigrid.wrappers import FullyObsWrapper as RefW

    ref_env, ref_obs, env, state = _setup(env_id, 3)
    theirs = RefW(ref_env.unwrapped).observation(ref_obs)["image"]
    mine = FullyObsWrapper(env).observation(env.observation(state), state)
    np.testing.assert_array_equal(np.asarray(mine["image"]), theirs)
    ref_env.close()


def _shim(cls, ref_env, **kw):
    """Reference wrappers rely on gym 0.x implicit attribute delegation,
    removed in gymnasium 1.x — forward the handful of attributes they use."""

    class Shim(cls):
        def __getattr__(self, name):
            return getattr(self.env.unwrapped, name)

    return Shim(ref_env.unwrapped, **kw)


@pytest.mark.parametrize("env_id", OBS_ENVS)
def test_symbolic_obs(env_id):
    from minigrid.wrappers import SymbolicObsWrapper as RefW

    ref_env, ref_obs, env, state = _setup(env_id, 4)
    theirs = _shim(RefW, ref_env).observation(dict(ref_obs))["image"]
    mine = SymbolicObsWrapper(env).observation(env.observation(state), state)
    np.testing.assert_array_equal(np.asarray(mine["image"]), theirs)
    ref_env.close()


@pytest.mark.parametrize("env_id", OBS_ENVS)
@pytest.mark.parametrize("view", [3, 5, 9])
def test_view_size(env_id, view):
    ref_env, ref_obs, env, state = _setup(env_id, 5)
    grid, vis = ref_env.unwrapped.gen_obs_grid(view)
    theirs = grid.encode(vis)
    mine = ViewSizeWrapper(env, view).observation(env.observation(state), state)
    np.testing.assert_array_equal(np.asarray(mine["image"]), theirs)
    ref_env.close()


@pytest.mark.parametrize("env_id", OBS_ENVS)
@pytest.mark.parametrize("tile_size", [8])
def test_rgb_img_obs(env_id, tile_size):
    ref_env, ref_obs, env, state = _setup(env_id, 6)
    theirs = ref_env.unwrapped.get_frame(highlight=True, tile_size=tile_size)
    mine = RGBImgObsWrapper(env, tile_size).observation(env.observation(state), state)
    np.testing.assert_array_equal(np.asarray(mine["image"]), theirs)
    ref_env.close()


@pytest.mark.parametrize("env_id", OBS_ENVS)
def test_rgb_img_partial_obs(env_id):
    ref_env, ref_obs, env, state = _setup(env_id, 7)
    theirs = ref_env.unwrapped.get_frame(tile_size=8, agent_pov=True)
    mine = RGBImgPartialObsWrapper(env, 8).observation(env.observation(state), state)
    np.testing.assert_array_equal(np.asarray(mine["image"]), theirs)
    ref_env.close()


@pytest.mark.parametrize("env_id", ["MiniGrid-Empty-5x5-v0", "MiniGrid-DoorKey-6x6-v0"])
def test_direction_obs(env_id):
    from minigrid.wrappers import DirectionObsWrapper as RefW

    ref_env, _, env, state = _setup(env_id, 8)
    ref_w = _shim(RefW, ref_env, type="slope")
    ref_obs2, _ = ref_w.reset(seed=8)
    state = state_from_reference(ref_env.unwrapped)
    mine = DirectionObsWrapper(env, type="slope").observation(
        env.observation(state), state
    )
    np.testing.assert_allclose(
        float(mine["goal_direction"]), float(ref_obs2["goal_direction"]), rtol=1e-6
    )
    ref_env.close()


def test_dict_observation_space():
    from minigrid.wrappers import DictObservationSpaceWrapper as RefW

    env_id = "MiniGrid-LavaCrossingS9N1-v0"
    ref_env, ref_obs, env, state = _setup(env_id, 9)
    theirs = RefW(ref_env.unwrapped).observation(dict(ref_obs))["mission"]
    mine = DictObservationSpaceWrapper(env).observation(env.observation(state), state)
    assert mine["mission"] == theirs
    ref_env.close()


def test_flat_obs():
    from minigrid.wrappers import FlatObsWrapper as RefW

    env_id = "MiniGrid-LavaCrossingS9N1-v0"
    ref_env, ref_obs, env, state = _setup(env_id, 10)
    theirs = RefW(ref_env.unwrapped).observation(dict(ref_obs))
    w = FlatObsWrapper(env)
    assert w._static_chars is not None  # static mission -> device path
    mine = np.asarray(w.observation(env.observation(state), state))
    assert mine.shape == theirs.shape
    np.testing.assert_allclose(mine, theirs.astype(np.float32))
    ref_env.close()


@pytest.mark.parametrize("wrapper_cls", ["action", "position"])
def test_bonus_arithmetic(wrapper_cls):
    """Exact 1/sqrt(count) bonus sequences vs the reference wrappers
    (reference tests/test_wrappers.py:84-132)."""
    from minigrid.wrappers import ActionBonus as RefA
    from minigrid.wrappers import PositionBonus as RefP

    env_id = "MiniGrid-Empty-5x5-v0"
    ref_env, _, env, state = _setup(env_id, 0)
    ref_w = (RefA if wrapper_cls == "action" else RefP)(ref_env.unwrapped)
    my_w = (ActionBonus if wrapper_cls == "action" else PositionBonus)(env)

    p = env.params
    if wrapper_cls == "action":
        counts = jnp.zeros((p.width, p.height, 4, 7), dtype=jnp.int32)
    else:
        counts = jnp.zeros((p.width, p.height), dtype=jnp.int32)
    ws = WrapperState(inner=state, data=counts)

    step = jax.jit(my_w.step)
    key = jax.random.PRNGKey(0)
    acts = [1, 1, 2, 2, 0, 2, 2, 1, 2, 2, 2, 0, 2]
    for t, a in enumerate(acts):
        _, ref_r, ref_term, ref_trunc, _ = ref_w.step(a)
        key, k = jax.random.split(key)
        _, ws, r, term, trunc, _ = step(k, ws, jnp.asarray(a))
        np.testing.assert_allclose(float(r), float(ref_r), rtol=1e-6, err_msg=f"t={t}")
        if ref_term or ref_trunc:
            break
    ref_env.close()


@pytest.mark.parametrize(
    "env_id,types",
    [
        ("MiniGrid-LavaCrossingS9N1-v0", ("lava",)),
        ("MiniGrid-DistShift1-v0", ("lava",)),
    ],
)
def test_no_death(env_id, types):
    """NoDeath cancels lava termination and adds death_cost, exactly like
    the reference (wrappers.py:799-872)."""
    from minigrid.wrappers import NoDeath as RefW

    ref_env, _, env, state = _setup(env_id, 2)
    ref_w = _shim(RefW, ref_env, no_death_types=types, death_cost=-1.0)
    my_w = NoDeath(env, no_death_types=types, death_cost=-1.0)

    step = jax.jit(my_w.step)
    rng = np.random.default_rng(7)
    acts = action_script(rng, 120)
    key = jax.random.PRNGKey(0)
    died = 0
    for t, a in enumerate(acts):
        _, ref_r, ref_term, ref_trunc, _ = ref_w.step(int(a))
        key, k = jax.random.split(key)
        _, state, r, term, trunc, _ = step(k, state, jnp.asarray(int(a)))
        ctx = f"{env_id} t={t} a={int(a)}"
        np.testing.assert_allclose(float(r), float(ref_r), atol=1e-6, err_msg=ctx)
        assert bool(term) == bool(ref_term), ctx
        assert bool(trunc) == bool(ref_trunc), ctx
        if float(ref_r) < 0:
            died += 1
        if ref_term or ref_trunc:
            break
    ref_env.close()


def test_stochastic_action_identity():
    """prob=1.0 -> actions pass through unchanged."""
    env = mgtpu.make("MiniGrid-Empty-5x5-v0")
    w = StochasticActionWrapper(env, prob=1.0)
    key = jax.random.PRNGKey(0)
    obs, state = env.reset(key)
    obs2, state2, *_ = jax.jit(w.step)(key, state, jnp.asarray(2))
    obs_ref, state_ref, *_ = jax.jit(env.step)(
        jax.random.split(key)[1], state, jnp.asarray(2)
    )
    np.testing.assert_array_equal(
        np.asarray(obs2["image"]), np.asarray(obs_ref["image"])
    )


def test_wrappers_jit_vmap():
    """Device-side wrappers compose under jit+vmap."""
    env = mgtpu.make("MiniGrid-Empty-8x8-v0")
    w = ImgObsWrapper(OneHotPartialObsWrapper(ViewSizeWrapper(env, 5)))
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    obs, state = jax.jit(jax.vmap(w.reset))(keys)
    assert obs.shape == (B, 5, 5, 20)
    obs, state, r, term, trunc, _ = jax.jit(jax.vmap(w.step))(
        keys, state, jnp.full((B,), 2)
    )
    assert obs.shape == (B, 5, 5, 20)

    wb = PositionBonus(env)
    obs, ws = jax.jit(jax.vmap(wb.reset))(keys)
    obs, ws, r, *_ = jax.jit(jax.vmap(wb.step))(keys, ws, jnp.full((B,), 2))
    assert r.shape == (B,)
