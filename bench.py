#!/usr/bin/env python
"""Headline benchmark: batched env-steps/s on one chip, honest per family.

Runs the lane-major (batch-last) fast path: full transition kernel + family
hooks (BabyAI verifier, DynamicObstacles ball moves) + egocentric observation
encoder every step (the obs output is checksummed so the compiler cannot
dead-code-eliminate it) + pool auto-reset (fresh layout per episode from a
pregenerated reservoir; the horizon exceeds max_steps so resets really fire).

Prints ONE JSON line:
  {"metric": "env_steps_per_s", "value": N, "unit": "steps/s",
   "vs_baseline": N, "extra": {per-family honest steps/s + VI sweeps/s}}

``vs_baseline`` divides by the reference implementation's single-env CPU
throughput measured in this environment (see BASELINE.md): the reference
(/root/reference) runs MiniGrid-DoorKey-8x8-v0 at ~10.1k steps/s with the
same random-action, auto-resetting loop (its ``step`` also encodes the
partial observation every call, minigrid_env.py:520-645).
"""

from __future__ import annotations

import json
import time

import jax

# Persistent compile cache: the generator programs are large; repeat bench
# runs should pay compile once per program shape.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import minigrid_dynamicprogramming_tpu as mgtpu
from minigrid_dynamicprogramming_tpu.parallel.lanes import lane_rollout

# Reference (CPU, single env, random actions incl. obs generation), measured
# in-environment 2026-08-17; see BASELINE.md.
REFERENCE_STEPS_PER_S = 10_145.0

# DoorKey-8x8 max_steps = 640: a 768-step horizon guarantees every lane
# truncates at least once, so the pool auto-reset path is really exercised.
BATCH = 65536
HORIZON = 768
POOL_ROUNDS = 4
WARMUP_ITERS = 1
TIMED_ITERS = 3


def _lane_steps_per_s(env_id, batch, horizon, warmup=1, iters=2, seed=0):
    env = mgtpu.make(env_id)
    key = jax.random.PRNGKey(seed)
    for _ in range(warmup):
        key, k = jax.random.split(key)
        res = lane_rollout(env, k, batch, horizon, "pool", POOL_ROUNDS)
        int(res.obs_checksum)  # host materialization = real synchronization
    t0 = time.perf_counter()
    total = 0
    for _ in range(iters):
        key, k = jax.random.split(key)
        res = lane_rollout(env, k, batch, horizon, "pool", POOL_ROUNDS)
        int(res.obs_checksum)
        total += batch * horizon
    return total / (time.perf_counter() - t0)


def _vi_sweeps_per_s(batch=1024, n_sweeps=128):
    """BASELINE.json's value-iteration sweeps/s metric (XLA backend)."""
    from functools import partial

    from minigrid_dynamicprogramming_tpu.dp.tabular import (
        extract_layout,
        value_iteration,
    )

    env = mgtpu.make("MiniGrid-DoorKey-8x8-v0")
    keys = jax.random.split(jax.random.PRNGKey(11), batch)
    gen = jax.jit(jax.vmap(env.generate, in_axes=(0, None)), static_argnums=1)
    states = gen(keys, env.params)
    layouts = jax.jit(jax.vmap(partial(extract_layout, max_doors=2)))(states)
    vi = jax.jit(jax.vmap(partial(value_iteration, gamma=0.995, n_sweeps=n_sweeps)))
    v, _ = vi(layouts)
    jax.block_until_ready(v)
    t0 = time.perf_counter()
    v, _ = vi(layouts)
    jax.block_until_ready(v)
    return batch * n_sweeps / (time.perf_counter() - t0)


def main() -> None:
    # Headline: DoorKey-8x8 (hook-free core MDP).
    headline = _lane_steps_per_s(
        "MiniGrid-DoorKey-8x8-v0",
        BATCH,
        HORIZON,
        warmup=WARMUP_ITERS,
        iters=TIMED_ITERS,
    )

    extra = {}
    # Hooked families on the same fast path (smaller batch to bound runtime;
    # steps/s at these sizes is within ~10% of the 64k-batch number).
    extra["babyai_gotolocal_steps_per_s"] = round(
        _lane_steps_per_s("BabyAI-GoToLocal-v0", 16384, 256, seed=1), 1
    )
    extra["dynamicobstacles_8x8_steps_per_s"] = round(
        _lane_steps_per_s("MiniGrid-Dynamic-Obstacles-8x8-v0", 16384, 256, seed=2),
        1,
    )
    try:
        extra["vi_sweeps_per_s"] = round(_vi_sweeps_per_s(), 1)
    except Exception as e:  # never let the side metric kill the headline
        extra["vi_sweeps_per_s"] = f"error: {type(e).__name__}"

    print(
        json.dumps(
            {
                "metric": "env_steps_per_s",
                "value": round(headline, 1),
                "unit": "steps/s",
                "vs_baseline": round(headline / REFERENCE_STEPS_PER_S, 2),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
