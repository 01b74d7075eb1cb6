"""Checkpoint / resume.

The reference has no checkpointing; its nearest analogs are env picklability
(tested in /root/reference/tests/test_envs.py:169-183) and the ``hash()``
state digest (minigrid_env.py:159-169).  Here everything that matters — env
states (batched pytrees), PPO train state, PRNG keys — is a pytree of
arrays, so checkpointing is a single orbax save with zero custom
serialization.  Each checkpoint also records the :func:`state_hash` digests
of a few env slots so a restore can be integrity-checked against the run it
came from (SURVEY.md §5, "Checkpoint / resume").
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from minigrid_dynamicprogramming_tpu.utils.debug import state_hash


def _digests(env_state, n: int = 4) -> list:
    """State digests of the first ``n`` env slots of a batched EnvState."""
    batch = int(np.asarray(env_state.step_count).shape[0])
    take = min(n, batch)
    host = jax.device_get(env_state)
    out = []
    for i in range(take):
        slot = jax.tree_util.tree_map(lambda x: x[i], host)
        out.append(state_hash(slot))
    return out


def save(path: str, tree: Any, env_state: Optional[Any] = None) -> dict:
    """Save a pytree checkpoint; returns the metadata written alongside.

    ``env_state`` (a batched EnvState, possibly a leaf of ``tree``) adds
    per-slot integrity digests to the metadata."""
    path = os.path.abspath(path)
    meta = {}
    if env_state is not None:
        meta["env_digests"] = _digests(env_state)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(tree), force=True)
    if meta:
        import json

        with open(os.path.join(path, "framework_meta.json"), "w") as f:
            json.dump(meta, f)
    return meta


def restore(path: str, target: Any, env_state_of=None, verify: bool = True):
    """Restore a checkpoint into the structure of ``target``.

    ``env_state_of`` is a callable extracting the batched EnvState from the
    restored tree; with ``verify=True`` its digests are checked against the
    saved metadata."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, jax.device_get(target))
    meta_path = os.path.join(path, "framework_meta.json")
    if verify and env_state_of is not None and os.path.exists(meta_path):
        import json

        with open(meta_path) as f:
            meta = json.load(f)
        got = _digests(env_state_of(restored))
        want = meta.get("env_digests", [])
        if want and got != want:
            raise ValueError(
                f"checkpoint integrity check failed: digests {got} != {want}"
            )
    return restored
