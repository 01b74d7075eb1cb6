import time
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import minigrid_dynamicprogramming_tpu as mgtpu
from minigrid_dynamicprogramming_tpu.parallel import lanes as L
env = mgtpu.make("MiniGrid-DoorKey-8x8-v0")
B, H = 65536, 768
key = jax.random.PRNGKey(0)
def timeit(f, *a, iters=2, warmup=1):
    for _ in range(warmup):
        int(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        int(f(*a))
    return (time.perf_counter() - t0) / iters
@jax.jit
def gen_pool(k):
    ks = jax.random.split(k, 4 * B)
    pool = jax.vmap(env.generate, in_axes=(0, None))(ks, env.params)
    return pool.grid_obj.astype(jnp.uint32).sum()
t_gen = timeit(gen_pool, key)
print(f"pool gen: {t_gen*1e3:.1f} ms")
t_full = timeit(lambda k: L.lane_rollout(env, k, B, H, "pool", 4).obs_checksum, key)
print(f"full rollout: {t_full*1e3:.1f} ms -> {B*H/t_full/1e6:.1f} M steps/s")
