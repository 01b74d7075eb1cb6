#!/usr/bin/env python
"""Headline benchmark: batched DoorKey-8x8 env-steps/s on one chip.

Runs the lane-major (batch-last) fast path: full transition kernel +
egocentric observation encoder every step (the obs output is checksummed so
the compiler cannot dead-code-eliminate it) + pool auto-reset (fresh layout
per episode from a pregenerated reservoir).

Prints ONE JSON line:
  {"metric": "env_steps_per_s", "value": N, "unit": "steps/s", "vs_baseline": N}

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

import minigrid_dynamicprogramming_tpu as mgtpu
from minigrid_dynamicprogramming_tpu.parallel.lanes import lane_rollout

# Reference (CPU, single env, random actions incl. obs generation), measured
# in-environment 2026-08-17; see BASELINE.md.
REFERENCE_STEPS_PER_S = 10_145.0

BATCH = 65536
HORIZON = 512
POOL_ROUNDS = 4
WARMUP_ITERS = 1
TIMED_ITERS = 4


def main() -> None:
    env = mgtpu.make("MiniGrid-DoorKey-8x8-v0")
    key = jax.random.PRNGKey(0)

    for _ in range(WARMUP_ITERS):
        key, k = jax.random.split(key)
        res = lane_rollout(env, k, BATCH, HORIZON, "pool", POOL_ROUNDS)
        int(res.obs_checksum)  # host materialization = real synchronization

    t0 = time.perf_counter()
    total_steps = 0
    for _ in range(TIMED_ITERS):
        key, k = jax.random.split(key)
        res = lane_rollout(env, k, BATCH, HORIZON, "pool", POOL_ROUNDS)
        # int() forces device->host transfer; block_until_ready alone can
        # return early on relayed backends.
        int(res.obs_checksum)
        total_steps += BATCH * HORIZON
    dt = time.perf_counter() - t0

    steps_per_s = total_steps / dt
    print(
        json.dumps(
            {
                "metric": "env_steps_per_s",
                "value": round(steps_per_s, 1),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_s / REFERENCE_STEPS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
