"""Micro-benchmark CLI.

Mirror of the reference's ``minigrid/benchmark.py`` (reset-ms / render-FPS /
agent-view-FPS over one env, /root/reference/minigrid/benchmark.py:13-49)
plus the metric the reference cannot express: batched env-steps/s on device.
Same default workload (``MiniGrid-LavaGapS7-v0``, 200 resets, 5000 frames,
benchmark.py:99-126).

Run: ``python -m minigrid_dynamicprogramming_tpu.benchmark --env-id ...``
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

import minigrid_dynamicprogramming_tpu as mgtpu
from minigrid_dynamicprogramming_tpu.parallel.rollout import rollout
from minigrid_dynamicprogramming_tpu.render import render_frame, render_pov


def benchmark(
    env_id: str = "MiniGrid-LavaGapS7-v0",
    num_resets: int = 200,
    num_frames: int = 5000,
    tile_size: int = 32,
    batch: int = 4096,
    horizon: int = 256,
) -> dict:
    env = mgtpu.make(env_id)

    # --- env.reset timing (benchmark.py:16-21) ---------------------------
    reset_fn = jax.jit(env.reset)
    obs, state = reset_fn(jax.random.PRNGKey(0))  # compile
    jax.block_until_ready(state.grid_obj)
    t0 = time.perf_counter()
    for i in range(num_resets):
        obs, state = reset_fn(jax.random.PRNGKey(i))
    jax.block_until_ready(state.grid_obj)
    reset_ms = (time.perf_counter() - t0) * 1000 / num_resets

    # --- full-frame rendering FPS (benchmark.py:24-29) -------------------
    render_fn = jax.jit(lambda s: render_frame(env.params, s, tile_size))
    frame = render_fn(state)
    jax.block_until_ready(frame)
    t0 = time.perf_counter()
    for _ in range(num_frames):
        frame = render_fn(state)
    jax.block_until_ready(frame)
    render_fps = num_frames / (time.perf_counter() - t0)

    # --- agent-view FPS: step + POV render (benchmark.py:31-47) ----------
    def step_and_pov(key, s, a):
        _, ns, *_ = env.step(key, s, a)
        return ns, render_pov(env.params, ns, tile_size)

    sp = jax.jit(step_and_pov)
    key = jax.random.PRNGKey(1)
    s = state
    s, img = sp(key, s, jnp.asarray(0))
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    for i in range(num_frames):
        s, img = sp(key, s, jnp.asarray(i % 3))
    jax.block_until_ready(img)
    agent_view_fps = num_frames / (time.perf_counter() - t0)

    # --- the TPU-native headline: batched env-steps/s --------------------
    res = rollout(env, jax.random.PRNGKey(2), batch, None, horizon, "regen")
    jax.block_until_ready(res.total_reward)
    t0 = time.perf_counter()
    res = rollout(env, jax.random.PRNGKey(3), batch, None, horizon, "regen")
    jax.block_until_ready(res.total_reward)
    steps_per_s = batch * horizon / (time.perf_counter() - t0)

    results = {
        "env_id": env_id,
        "reset_ms": round(reset_ms, 4),
        "render_fps": round(render_fps, 1),
        "agent_view_fps": round(agent_view_fps, 1),
        "batched_env_steps_per_s": round(steps_per_s, 1),
        "batch": batch,
    }
    for k, v in results.items():
        print(f"{k}: {v}")
    return results


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--env-id", default="MiniGrid-LavaGapS7-v0")
    p.add_argument("--num-resets", type=int, default=200)
    p.add_argument("--num-frames", type=int, default=5000)
    p.add_argument("--tile-size", type=int, default=32)
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--horizon", type=int, default=256)
    args = p.parse_args()
    benchmark(
        args.env_id,
        args.num_resets,
        args.num_frames,
        args.tile_size,
        args.batch,
        args.horizon,
    )


if __name__ == "__main__":
    main()
