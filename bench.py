#!/usr/bin/env python
"""Headline benchmark: batched DoorKey-8x8 env-steps/s on one chip.

Prints ONE JSON line:
  {"metric": "env_steps_per_s", "value": N, "unit": "steps/s", "vs_baseline": N}

``vs_baseline`` divides by the reference implementation's single-env CPU
throughput measured in this environment (see BASELINE.md): the reference
(/root/reference) runs MiniGrid-DoorKey-8x8-v0 at ~10.1k steps/s with the
same random-action, auto-resetting loop.
"""

from __future__ import annotations

import json
import time

import jax

import minigrid_dynamicprogramming_tpu as mgtpu
from minigrid_dynamicprogramming_tpu.parallel.rollout import rollout

# Reference (CPU, single env, random actions incl. obs generation), measured
# in-environment 2026-08-17; see BASELINE.md.
REFERENCE_STEPS_PER_S = 10_145.0

BATCH = 8192
HORIZON = 256
WARMUP_ITERS = 1
TIMED_ITERS = 4


def main() -> None:
    env = mgtpu.make("MiniGrid-DoorKey-8x8-v0")
    key = jax.random.PRNGKey(0)

    # Warmup / compile.
    for i in range(WARMUP_ITERS):
        key, k = jax.random.split(key)
        res = rollout(env, k, BATCH, None, HORIZON, "regen")
        jax.block_until_ready(res.total_reward)

    t0 = time.perf_counter()
    total_steps = 0
    for i in range(TIMED_ITERS):
        key, k = jax.random.split(key)
        res = rollout(env, k, BATCH, None, HORIZON, "regen")
        jax.block_until_ready(res.total_reward)
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
