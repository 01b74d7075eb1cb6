"""Environment registry.

Keeps the reference's public id strings (registered via 171 ``gym.register``
calls in /root/reference/minigrid/__init__.py:23-1130) mapped to factory
functions that build :class:`Environment` instances.  Ids are identical to
the reference so user code can switch frameworks by swapping ``gym.make``
for :func:`make`.
"""

from __future__ import annotations

from typing import Callable, Dict

from minigrid_dynamicprogramming_tpu.core.env import Environment

_REGISTRY: Dict[str, Callable[[], Environment]] = {}


def register(env_id: str, factory: Callable[[], Environment]) -> None:
    _REGISTRY[env_id] = factory


def make(env_id: str) -> Environment:
    if env_id not in _REGISTRY:
        raise KeyError(
            f"Unknown environment id {env_id!r}; "
            f"{len(_REGISTRY)} ids registered."
        )
    return _REGISTRY[env_id]()


def registered_ids() -> list[str]:
    return sorted(_REGISTRY)


def _register_all() -> None:
    from minigrid_dynamicprogramming_tpu.envs.empty import make_empty
    from minigrid_dynamicprogramming_tpu.envs.doorkey import make_doorkey
    from minigrid_dynamicprogramming_tpu.envs.fourrooms import make_fourrooms

    # Empty (reference __init__.py:165-201)
    for size in (5, 6, 8, 16):
        env_id = f"MiniGrid-Empty-{size}x{size}-v0"
        register(env_id, lambda i=env_id, s=size: make_empty(i, size=s))
    for size in (5, 6):
        env_id = f"MiniGrid-Empty-Random-{size}x{size}-v0"
        register(
            env_id,
            lambda i=env_id, s=size: make_empty(i, size=s, agent_start_pos=None),
        )

    # DoorKey (reference __init__.py:100-125)
    for size in (5, 6, 8, 16):
        env_id = f"MiniGrid-DoorKey-{size}x{size}-v0"
        register(env_id, lambda i=env_id, s=size: make_doorkey(i, size=s))

    # FourRooms (reference __init__.py: FourRooms-v0)
    register("MiniGrid-FourRooms-v0", lambda: make_fourrooms("MiniGrid-FourRooms-v0"))


_register_all()
