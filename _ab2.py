import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import minigrid_dynamicprogramming_tpu as mgtpu
from minigrid_dynamicprogramming_tpu.parallel import lanes as L
for eid, B, H in (("BabyAI-GoToLocal-v0", 16384, 256), ("MiniGrid-Dynamic-Obstacles-8x8-v0", 16384, 256)):
    env = mgtpu.make(eid)
    key = jax.random.PRNGKey(2)
    t0 = time.perf_counter()
    int(L.lane_rollout(env, key, B, H, "pool", 4).obs_checksum)
    t1 = time.perf_counter()
    int(L.lane_rollout(env, jax.random.fold_in(key, 1), B, H, "pool", 4).obs_checksum)
    t2 = time.perf_counter()
    print(f"{eid}: first {t1-t0:.1f}s; steady {(t2-t1)*1e3:.1f} ms -> {B*H/(t2-t1)/1e6:.1f} M steps/s")
