"""Scratch: generation vs stepping time for the tail families."""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import minigrid_dynamicprogramming_tpu as mgtpu
from minigrid_dynamicprogramming_tpu.parallel.lanes import lane_rollout

B = 16384
H = 256

for env_id in (
    "BabyAI-BossLevel-v0",
    "MiniGrid-KeyCorridorS6R3-v0",
    "MiniGrid-MultiRoom-N6-v0",
):
    env = mgtpu.make(env_id)
    gen = jax.jit(jax.vmap(env.generate, in_axes=(0, None)), static_argnums=1)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    t0 = time.perf_counter()
    st = gen(keys, env.params)
    jax.block_until_ready(st.agent_dir)
    compile_and_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    st = gen(jax.random.split(jax.random.PRNGKey(1), B), env.params)
    jax.block_until_ready(st.agent_dir)
    gen_t = time.perf_counter() - t0
    # full bench-style rollout (pool generation inside)
    res = lane_rollout(env, jax.random.PRNGKey(2), B, H, "pool", 2)
    int(res.obs_checksum)
    t0 = time.perf_counter()
    res = lane_rollout(env, jax.random.PRNGKey(3), B, H, "pool", 2)
    int(res.obs_checksum)
    roll_t = time.perf_counter() - t0
    print(
        f"{env_id:32s} gen(16k)={gen_t:7.3f}s  rollout(pool2,256)={roll_t:7.3f}s"
        f"  -> steps/s={B * H / roll_t:12,.0f}  (first-call={compile_and_run:.1f}s)",
        flush=True,
    )
