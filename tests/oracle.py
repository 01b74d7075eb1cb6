"""Helpers for driving the reference implementation as the CPU oracle."""

from __future__ import annotations

import numpy as np


def make_reference_env(env_id: str, seed: int):
    import pytest

    # Parity tests need the upstream reference as oracle (conftest puts
    # /root/reference on sys.path); in CI environments without it the
    # parity tier skips instead of erroring.
    gym = pytest.importorskip("gymnasium")
    minigrid = pytest.importorskip(
        "minigrid", reason="reference oracle not on sys.path"
    )

    try:
        env = gym.make(env_id, disable_env_checker=True)
    except Exception:
        minigrid.register_minigrid_envs()
        env = gym.make(env_id, disable_env_checker=True)
    obs, _ = env.reset(seed=seed)
    return env, obs


def action_script(rng: np.ndarray, n: int, num_actions: int = 7) -> np.ndarray:
    """Random action script biased toward motion so trajectories cover the
    grid; includes all interaction actions."""
    probs = np.array([0.15, 0.15, 0.40, 0.10, 0.05, 0.10, 0.05])[:num_actions]
    probs = probs / probs.sum()
    return rng.choice(num_actions, size=n, p=probs)
