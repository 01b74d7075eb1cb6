import sys, time
import jax
if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import numpy as np
import jax.numpy as jnp
import minigrid_dynamicprogramming_tpu as mgtpu
from minigrid_dynamicprogramming_tpu.parallel.lanes import lane_rollout

fp = {}
for eid in ("MiniGrid-DoorKey-8x8-v0", "MiniGrid-MultiRoom-N4-S5-v0", "BabyAI-GoTo-v0"):
    env = mgtpu.make(eid)
    keys = jax.random.split(jax.random.PRNGKey(0), 8192)
    st = jax.jit(jax.vmap(env.generate, in_axes=(0, None)), static_argnums=1)(keys, env.params)
    h, w = env.params.height, env.params.width
    wgt = (jnp.arange(h * w, dtype=jnp.int64 if False else jnp.int32) * 31 + 7).reshape(h, w)
    fp[eid] = [int((st.grid_obj.astype(jnp.int32) * wgt).sum()),
               int((st.grid_color.astype(jnp.int32) * wgt).sum()),
               int((st.grid_state.astype(jnp.int32) * wgt).sum()),
               int(st.agent_pos.sum()), int(st.aux.sum()), int(st.marks.astype(jnp.int32).sum())]
    print(eid, fp[eid], flush=True)
# public-API drive + lane rollout with episode crossing (small shapes)
env = mgtpu.make("MiniGrid-Empty-5x5-v0")
obs, state = jax.jit(jax.vmap(env.reset))(jax.random.split(jax.random.PRNGKey(1), 64))
print("reset", jax.devices()[0], obs["image"].shape, flush=True)
res = lane_rollout(env, jax.random.PRNGKey(3), 64, 256, "pool", 4)
print("lane", int(res.episodes), round(float(res.total_reward), 3), int(res.obs_checksum), flush=True)
