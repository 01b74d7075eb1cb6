"""Scaling-efficiency harness + multi-host entry point tests.

Runs on the virtual 8-device CPU mesh (conftest). The BASELINE target
(>= 85% linear scaling) is measured on real hardware by bench.py; here we
guard that the harness itself measures correctly and that the
``jax.distributed`` entry point forms a process group.
"""

from __future__ import annotations

import socket

import jax
import numpy as np

from minigrid_dynamicprogramming_tpu.parallel import distributed
from minigrid_dynamicprogramming_tpu.parallel.scaling import measure_scaling


def test_measure_scaling_reports_points():
    pts = measure_scaling(
        "MiniGrid-Empty-5x5-v0",
        per_device_batch=64,
        horizon=32,
        device_counts=[1, 2],
        warmup=1,
        iters=1,
    )
    assert [p.n_devices for p in pts] == [1, 2]
    assert pts[0].batch == 64 and pts[1].batch == 128
    for p in pts:
        assert p.steps_per_s > 0
    # efficiency is steps/s(n) / (n * steps/s(1)); the 1-device point is 1.0
    # by definition, the 2-device point must be finite and positive (its
    # value on a virtual CPU mesh is noise, not the BASELINE metric).
    assert pts[0].efficiency == 1.0
    assert np.isfinite(pts[1].efficiency) and pts[1].efficiency > 0


def test_distributed_initialize_single_process():
    """Forming a 1-process group through the public entry point must work
    (fresh process: jax.distributed.initialize must precede backend init)
    and be idempotent; the mesh helper must then span every device."""
    import subprocess
    import sys

    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    addr = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()
    prog = f"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
# package import is lazy (PEP 562) so this does no device work and
# jax.distributed.initialize can still run
from minigrid_dynamicprogramming_tpu.parallel import distributed
distributed.initialize("{addr}", num_processes=1, process_id=0)
distributed.initialize()  # idempotent second call: no-op
assert distributed.is_initialized()
mesh = distributed.global_env_mesh()
assert mesh.devices.size == len(jax.devices()) == 4, mesh
print(distributed.process_summary())
"""
    out = subprocess.run(
        [sys.executable, "-c", prog],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    assert "process 0/1" in out.stdout
    assert "global_devices=4" in out.stdout


def test_distributed_initialize_after_backend_raises_with_guidance():
    jax.devices()  # backend is up in the test process
    distributed._initialized = False
    try:
        with np.testing.assert_raises(RuntimeError):
            distributed.initialize("127.0.0.1:1", 1, 0)
    finally:
        distributed._initialized = False
