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

def timeit(f, *a, iters=3, warmup=1):
    for _ in range(warmup):
        int(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        int(f(*a))
    return (time.perf_counter() - t0) / iters

t_full = timeit(lambda k: L.lane_rollout(env, k, B, H, "pool", 4).obs_checksum, key)
print(f"full rollout: {t_full*1e3:.1f} ms -> {B*H/t_full/1e6:.1f} M steps/s")

@jax.jit
def gen_pool(k):
    ks = jax.random.split(k, 4 * B)
    pool = jax.vmap(env.generate, in_axes=(0, None))(ks, env.params)
    pool = jax.vmap(L.to_lanes)(
        jax.tree_util.tree_map(lambda x: x.reshape((4, B) + x.shape[1:]), pool)
    )
    return pool, pool.grid_obj.astype(jnp.uint32).sum()
pool, _ = gen_pool(key)
ls0 = jax.tree_util.tree_map(lambda x: x[0], pool)

@jax.jit
def scan_obs_only(ls, k):
    def body(carry, kt):
        ls2 = ls.replace(agent_dir=(ls.agent_dir + carry) % 4)
        obj, color, st, vis = L.obs_lanes(env.params, ls2)
        visu = vis.astype(jnp.uint8)
        cs = ((obj * visu).astype(jnp.uint32) + (color * visu).astype(jnp.uint32)
              + (st * visu).astype(jnp.uint32)).sum(dtype=jnp.uint32)
        return carry + 1, cs
    c, css = jax.lax.scan(body, 0, jnp.arange(H))
    return css.sum()
t_obs = timeit(scan_obs_only, ls0, key)
print(f"obs only:    {t_obs*1e3:.1f} ms -> {B*H/t_obs/1e6:.1f} M steps/s")
