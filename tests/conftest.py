"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
code paths are exercised without TPU hardware, and keep pygame headless for
the reference oracle."""

import os
import sys

os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
os.environ.setdefault("SDL_AUDIODRIVER", "dummy")

# The container's sitecustomize force-registers the axon TPU backend and
# re-exports JAX_PLATFORMS=axon, so env vars alone don't stick; the config
# update after import does.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Persistent compile cache: the registry-wide generator sweeps compile one
# program per env id, which dominates suite runtime on a cold start.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_cpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

REFERENCE_PATH = "/root/reference"
if REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)
