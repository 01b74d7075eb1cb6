"""Seed-matched generation + trajectory parity (no snapshotting).

Both sides start from nothing but ``(env_id, seed)``:

* the reference resets through Gymnasium (`env.reset(seed=...)`);
* our side generates the layout with the NumPy parity twin
  (utils/parity_twin.py) — which replays the reference's PCG64 draw order
  without calling the reference — and uploads it as a device ``EnvState``.

Layout tests assert the generated grids are identical; trajectory tests
then drive the device step kernels against the reference episode and
require bit-exact observations/rewards/termination, closing the SURVEY
§7.3.1 "parity twin" requirement end-to-end.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax

from minigrid_dynamicprogramming_tpu.utils.parity_twin import (
    twin_ids,
    twin_layout,
    twin_reset,
)

from .oracle import action_script, make_reference_env

# 3 seeds/id in the default tier (VERDICT r4 #6: trim FAST_SEEDS); the
# slow tier covers 200 seeds/id.
FAST_SEEDS = list(range(3))
SLOW_SEEDS = list(range(200))


def _assert_layout_matches(env_id: str, seed: int) -> None:
    ref_env, _ = make_reference_env(env_id, seed)
    ref = ref_env.unwrapped
    layout = twin_layout(env_id, seed)

    enc = ref.grid.encode()  # (w, h, 3)
    np.testing.assert_array_equal(
        layout.grid_obj, enc[:, :, 0].T, err_msg=f"{env_id} seed={seed} obj plane"
    )
    np.testing.assert_array_equal(
        layout.grid_color, enc[:, :, 1].T, err_msg=f"{env_id} seed={seed} color"
    )
    np.testing.assert_array_equal(
        layout.grid_state, enc[:, :, 2].T, err_msg=f"{env_id} seed={seed} state"
    )
    assert layout.agent_pos == (int(ref.agent_pos[0]), int(ref.agent_pos[1])), (
        f"{env_id} seed={seed} agent_pos"
    )
    assert layout.agent_dir == int(ref.agent_dir), f"{env_id} seed={seed} agent_dir"

    if "obstacles" in layout.extra:
        ref_obs_pos = [tuple(map(int, o.cur_pos)) for o in ref.obstacles]
        assert layout.extra["obstacles"] == ref_obs_pos, f"{env_id} seed={seed}"
    if "max_steps" in layout.extra:
        assert layout.extra["max_steps"] == int(ref.max_steps), f"{env_id} seed={seed}"
    if "instrs" in layout.extra:
        # The decisive check: the twin's device encoding (mission codes +
        # identity mark planes + carrying bits) must equal the encoding of
        # the reference's actual instruction tree.
        from minigrid_dynamicprogramming_tpu.utils.parity import (
            babyai_from_reference,
            state_from_reference,
        )

        st_t, _ = twin_reset(env_id, seed)
        st_r = babyai_from_reference(ref_env, state_from_reference(ref_env))
        np.testing.assert_array_equal(
            np.asarray(st_t.mission), np.asarray(st_r.mission),
            err_msg=f"{env_id} seed={seed} mission codes",
        )
        np.testing.assert_array_equal(
            np.asarray(st_t.marks), np.asarray(st_r.marks),
            err_msg=f"{env_id} seed={seed} mark planes",
        )
        assert int(st_t.carrying_marks) == int(st_r.carrying_marks)
    ref_env.close()


@pytest.mark.parametrize("env_id", twin_ids())
def test_layout_parity(env_id):
    for seed in FAST_SEEDS:
        _assert_layout_matches(env_id, seed)


@pytest.mark.slow
@pytest.mark.parametrize("env_id", twin_ids())
def test_layout_parity_deep(env_id):
    for seed in SLOW_SEEDS:
        _assert_layout_matches(env_id, seed)


# Deterministic-transition configs: the full episode must match from seed
# alone.  (DynamicObstacles moves its balls through the RNG each step, so it
# is covered by the layout test + behavioral tests in test_hook_parity.)
TRAJ_ENVS = [
    "MiniGrid-Empty-5x5-v0",
    "MiniGrid-Empty-8x8-v0",
    "MiniGrid-FourRooms-v0",
    "MiniGrid-DoorKey-8x8-v0",
    "MiniGrid-LavaCrossingS9N2-v0",
    "MiniGrid-SimpleCrossingS9N1-v0",
    "MiniGrid-DistShift2-v0",
    "MiniGrid-LavaGapS7-v0",
    "MiniGrid-Fetch-8x8-N3-v0",
    "MiniGrid-GoToDoor-8x8-v0",
    "MiniGrid-GoToObject-8x8-N2-v0",
    "MiniGrid-PutNear-8x8-N3-v0",
    "MiniGrid-RedBlueDoors-8x8-v0",
    "MiniGrid-MemoryS13-v0",
    "MiniGrid-LockedRoom-v0",
    "MiniGrid-MultiRoom-N6-v0",
    "MiniGrid-Playground-v0",
    "MiniGrid-KeyCorridorS6R3-v0",
    "MiniGrid-Unlock-v0",
    "MiniGrid-UnlockPickup-v0",
    "MiniGrid-BlockedUnlockPickup-v0",
    "MiniGrid-ObstructedMaze-1Dlhb-v0",
    "MiniGrid-ObstructedMaze-Full-v1",
    "BabyAI-GoToDoor-v0",
    "BabyAI-UnlockPickup-v0",
    "BabyAI-GoToRedBallGrey-v0",
    "BabyAI-GoToLocal-v0",
    "BabyAI-GoToObjMazeS4R2-v0",
    "BabyAI-GoToImpUnlock-v0",
    "BabyAI-GoToSeqS5R2-v0",
    "BabyAI-Open-v0",
    "BabyAI-OpenDoorLoc-v0",
    "BabyAI-OpenTwoDoors-v0",
    "BabyAI-OpenDoorsOrderN4-v0",
    "BabyAI-Pickup-v0",
    "BabyAI-PickupDistDebug-v0",
    "BabyAI-PickupAbove-v0",
    "BabyAI-PutNextLocalS6N4-v0",
    "BabyAI-PutNextS5N2-v0",
    "BabyAI-PutNextS5N2Carrying-v0",
    "BabyAI-Unlock-v0",
    "BabyAI-KeyInBox-v0",
    "BabyAI-BlockedUnlockPickup-v0",
    "BabyAI-UnlockToUnlock-v0",
    "BabyAI-ActionObjDoor-v0",
    "BabyAI-FindObjS5-v0",
    "BabyAI-KeyCorridorS3R2-v0",
    "BabyAI-MoveTwoAcrossS5N2-v0",
    "BabyAI-Synth-v0",
    "BabyAI-SynthSeq-v0",
    "BabyAI-MiniBossLevel-v0",
    "BabyAI-BossLevel-v0",
]

# PutNext start_carrying quirk (putnext.py:192-201): the reference's reset
# returns an observation rendered *before* the carried object is lifted off
# the grid, so the first obs differs by construction; parity holds from the
# first step onward.
_CARRYING_IDS = {i for i in TRAJ_ENVS if "Carrying" in i}


@pytest.mark.parametrize("env_id", TRAJ_ENVS)
@pytest.mark.parametrize("seed", [0, 23])
def test_trajectory_parity_from_seed(env_id, seed, n_steps=150):
    ref_env, ref_obs = make_reference_env(env_id, seed)
    state, env = twin_reset(env_id, seed)

    if env_id not in _CARRYING_IDS:
        obs0 = jax.jit(env.observation)(state)
        np.testing.assert_array_equal(
            np.asarray(obs0["image"]), ref_obs["image"],
            err_msg=f"{env_id} seed={seed} reset obs",
        )

    step_fn = jax.jit(env.step)
    rng = np.random.default_rng(seed + 1234)
    acts = action_script(rng, n_steps)
    key = jax.random.PRNGKey(0)
    for t, a in enumerate(acts):
        ref_obs, ref_r, ref_term, ref_trunc, _ = ref_env.step(int(a))
        key, k = jax.random.split(key)
        obs, state, r, term, trunc, _ = step_fn(k, state, np.int32(a))
        msg = f"{env_id} seed={seed} t={t}"
        np.testing.assert_array_equal(np.asarray(obs["image"]), ref_obs["image"], msg)
        assert int(obs["direction"]) == int(ref_obs["direction"]), msg
        np.testing.assert_allclose(float(r), float(ref_r), rtol=1e-6, err_msg=msg)
        assert bool(term) == bool(ref_term), msg
        assert bool(trunc) == bool(ref_trunc), msg
        if ref_term or ref_trunc:
            break
    ref_env.close()


@pytest.mark.slow
@pytest.mark.parametrize("env_id", TRAJ_ENVS)
@pytest.mark.parametrize("seed", [7, 41, 97])
def test_trajectory_parity_from_seed_deep(env_id, seed):
    test_trajectory_parity_from_seed(env_id, seed)


# Stochastic-TRANSITION family: the reference consumes np_random draws inside
# ``step`` (one place_obj per obstacle per step, dynamicobstacles.py:141-158),
# so full-episode parity needs the host step twin (DynObsStepTwin) to continue
# the draw stream and upload each step's ball moves + pre-move collision flag.
DYNOBS_IDS = sorted(i for i in twin_ids() if "Dynamic-Obstacles" in i)


@pytest.mark.parametrize("env_id", DYNOBS_IDS)
@pytest.mark.parametrize("seed", [0, 7, 23])
def test_trajectory_parity_dynobs(env_id, seed, n_steps=120):
    import copy

    import jax.numpy as jnp

    from minigrid_dynamicprogramming_tpu.envs.dynamicobstacles import (
        NOT_CLEAR_SLOT,
    )
    from minigrid_dynamicprogramming_tpu.utils.parity_twin import DynObsStepTwin

    ref_env, ref_obs = make_reference_env(env_id, seed)
    layout = twin_layout(env_id, seed)
    state, env = twin_reset(env_id, seed, layout=layout)
    stwin = DynObsStepTwin(layout)

    obs0 = jax.jit(env.observation)(state)
    np.testing.assert_array_equal(
        np.asarray(obs0["image"]), ref_obs["image"],
        err_msg=f"{env_id} seed={seed} reset obs",
    )

    # Ball moves + collision flag are uploaded host-side each step; the
    # device runs the rest of the transition (pre_step disabled).
    env_nopre = copy.copy(env)
    env_nopre.pre_step = None
    step_fn = jax.jit(env_nopre.step)

    rng = np.random.default_rng(seed + 1234)
    acts = action_script(rng, n_steps)
    key = jax.random.PRNGKey(0)
    for t, a in enumerate(acts):
        ref_obs, ref_r, ref_term, ref_trunc, _ = ref_env.step(int(a))
        a2, not_clear = stwin.host_pre_step(int(a))
        obj, color, st, _, _ = stwin.t.planes()
        aux = np.asarray(state.aux).copy()
        for k2, ball in enumerate(stwin.obstacles):
            aux[2 * k2], aux[2 * k2 + 1] = ball.pos
        aux[NOT_CLEAR_SLOT] = int(not_clear)
        state = state.replace(
            grid_obj=jnp.asarray(obj),
            grid_color=jnp.asarray(color),
            grid_state=jnp.asarray(st),
            aux=jnp.asarray(aux),
        )
        key, k = jax.random.split(key)
        obs, state, r, term, trunc, _ = step_fn(k, state, np.int32(a))
        stwin.mirror_agent_move(a2)
        msg = f"{env_id} seed={seed} t={t}"
        np.testing.assert_array_equal(
            np.asarray(obs["image"]), ref_obs["image"], msg
        )
        assert int(obs["direction"]) == int(ref_obs["direction"]), msg
        np.testing.assert_allclose(float(r), float(ref_r), rtol=1e-6, err_msg=msg)
        assert bool(term) == bool(ref_term), msg
        assert bool(trunc) == bool(ref_trunc), msg
        if ref_term or ref_trunc:
            break
    ref_env.close()
