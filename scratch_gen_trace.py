"""Scratch: per-op trace of generation for one family."""
import collections
import glob
import gzip
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import minigrid_dynamicprogramming_tpu as mgtpu

env_id = sys.argv[1] if len(sys.argv) > 1 else "MiniGrid-KeyCorridorS6R3-v0"
B = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
use_batch = len(sys.argv) > 3 and sys.argv[3] == "batch"

env = mgtpu.make(env_id)
if use_batch and env.generate_batch is not None:
    gen = jax.jit(
        lambda k: env.generate_batch(k, env.params, B)
    )
    run = lambda s: gen(jax.random.PRNGKey(s))
else:
    gen = jax.jit(jax.vmap(env.generate, in_axes=(0, None)), static_argnums=1)
    run = lambda s: gen(jax.random.split(jax.random.PRNGKey(s), B), env.params)

st = run(0)
jax.block_until_ready(st.agent_dir)
t0 = time.perf_counter()
st = run(1)
jax.block_until_ready(st.agent_dir)
print(f"{env_id} gen({B}) = {time.perf_counter() - t0:.3f}s  batch={use_batch}")

with jax.profiler.trace("/tmp/gentrace"):
    st = run(2)
    jax.block_until_ready(st.agent_dir)

p = sorted(glob.glob("/tmp/gentrace/plugins/profile/*/vm.trace.json.gz"))[-1]
tr = json.load(gzip.open(p))
evs = tr["traceEvents"]
pidname = {}
for e in evs:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pidname[e["pid"]] = e["args"].get("name", "")
agg = collections.defaultdict(lambda: [0.0, 0])
for e in evs:
    if e.get("ph") == "X" and "dur" in e and "TPU" in pidname.get(e["pid"], ""):
        agg[e["name"]][0] += e["dur"] / 1e3
        agg[e["name"]][1] += 1
for nm, (tot, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:18]:
    print(f"{tot:9.2f} ms x{cnt:6d}  {nm[:100]}")
