"""Pooled oversample-and-compact generation (envs/babyai/level.py
``generate_batch``): the lane pool builder's fast path.

Correctness bar: ``generate_batch(key, p, n)`` must be distributed
identically to ``vmap(generate)`` over n fresh keys — the accepted
attempts are iid from the same acceptance-conditioned law — and the
compaction must never ship a rejected layout.  The margin guard asserts
the oversampling factor stays far above the measured per-attempt
rejection rate, because a shortfall would silently duplicate layouts.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import minigrid_dynamicprogramming_tpu as mgtpu
from minigrid_dynamicprogramming_tpu.utils.telemetry import (
    generation_acceptance,
)

# BossLevel exercises the same pooled path through the deepest LevelGen
# program (~25 s/test on the CI runner); it runs in -m slow, the other
# three regimes (fixed-room, RoomGrid, recursive MultiRoom) stay default.
BENCH_IDS = [
    "BabyAI-GoToLocal-v0",
    "BabyAI-GoToDoor-v0",
    "MiniGrid-MultiRoom-N6-v0",
]
DEEP_IDS = ["BabyAI-BossLevel-v0"]


def _margin(env):
    return env.params.opt("gen_oversample") or 1.5


@pytest.mark.parametrize("env_id", BENCH_IDS)
def test_pooled_matches_loop_distribution(env_id):
    """Chi-square on the per-cell object-type histogram between the
    while_loop sampler and the pooled sampler (same law expected)."""
    env = mgtpu.make(env_id)
    n = 192
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    loop = jax.jit(jax.vmap(env.generate, in_axes=(0, None)), static_argnums=1)(
        keys, env.params
    )
    pooled = jax.jit(env.generate_batch, static_argnums=2)(
        jax.random.PRNGKey(1), env.params, n
    )
    a = np.bincount(np.asarray(loop.grid_obj).ravel(), minlength=11).astype(
        np.float64
    )
    b = np.bincount(np.asarray(pooled.grid_obj).ravel(), minlength=11).astype(
        np.float64
    )
    keep = (a + b) > 20
    a, b = a[keep], b[keep]
    # Two-sample chi-square; dof = bins - 1.
    chi2 = ((a - b) ** 2 / (a + b)).sum()
    dof = max(len(a) - 1, 1)
    # 99.9% quantile of chi2(dof) is about dof + 3.29 * sqrt(2 * dof) + 5.
    assert chi2 < dof + 3.29 * np.sqrt(2 * dof) + 5, (env_id, chi2, dof)
    # Pooled layouts must be agent-placed and mission-initialized.
    assert bool(jnp.all(pooled.agent_pos >= 0))
    if env_id.startswith("BabyAI-"):
        assert bool(jnp.any(pooled.mission != 0))


@pytest.mark.parametrize("env_id", [i for i in BENCH_IDS if "BabyAI" in i])
def test_pooled_margin_is_safe(env_id):
    """margin * accept_rate must stay >= 1.2 so compaction shortfall
    (which would duplicate layouts) stays astronomically improbable.
    (MultiRoom's margin is per-id and sized from measured single-attempt
    success inside its generate_batch; its guard is the chi-square above.)"""
    env = mgtpu.make(env_id)
    rep = generation_acceptance(env, n=384)
    p_accept = 1.0 / rep["mean_tries"]
    assert _margin(env) * p_accept >= 1.2, (env_id, rep["mean_tries"])


@pytest.mark.slow
@pytest.mark.parametrize("env_id", DEEP_IDS)
def test_pooled_matches_loop_distribution_deep(env_id):
    test_pooled_matches_loop_distribution(env_id)


@pytest.mark.slow
@pytest.mark.parametrize("env_id", DEEP_IDS)
def test_pooled_margin_is_safe_deep(env_id):
    test_pooled_margin_is_safe(env_id)


@pytest.mark.slow
def test_pooled_margin_safe_all_babyai():
    """Sweep every BabyAI id: no registered level may have a rejection
    rate that makes its pooled margin unsafe."""
    bad = []
    from minigrid_dynamicprogramming_tpu.registry import registered_ids

    for env_id in registered_ids():
        if not env_id.startswith("BabyAI-"):
            continue
        env = mgtpu.make(env_id)
        if env.generate_batch is None:
            continue
        rep = generation_acceptance(env, n=192)
        if _margin(env) / rep["mean_tries"] < 1.2:
            bad.append((env_id, rep["mean_tries"]))
    assert not bad, bad
