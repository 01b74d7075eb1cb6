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
_FAMILY: Dict[str, str] = {}  # env id -> family slug (factory name)


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


def family(env_id: str) -> str:
    """Family slug for an id (the factory name minus ``make_``) — the docs
    generator's analog of the reference's one-page-per-env-class grouping
    (docs/_scripts/gen_env_docs.py entry-point parsing)."""
    return _FAMILY.get(env_id, "misc")


# Families whose generators can never place a Box (nor, being MiniGrid
# rather than BabyAI, any verifier mark): the step/reset kernels statically
# skip the contains/marks planes for them — the planes stay constant, so
# XLA carries them through rollouts untouched (parallel/lanes.py).
_BOX_FREE_FAMILIES = frozenset(
    {
        "empty",
        "doorkey",
        "fourrooms",
        "crossing",
        "distshift",
        "lavagap",
        "dynamicobstacles",
        "fetch",
        "gotodoor",
        "lockedroom",
        "memory",
        "multiroom",
        "redbluedoors",
        "keycorridor",
    }
)

# Families whose mission code vector is one per-id constant (the reference
# mission string has no placeholders, e.g. DoorKey's "use the key to open
# the door...") — the autoreset select skips the (MISSION_SLOTS, B) vector.
# Guarded by tests/test_lanes.py::test_fixed_flags_hold.
_FIXED_MISSION_FAMILIES = frozenset(
    {
        "empty",
        "doorkey",
        "fourrooms",
        "crossing",
        "distshift",
        "lavagap",
        "dynamicobstacles",
        "multiroom",
        "redbluedoors",
        "memory",
        "playground",
    }
)

# Families that never write the aux scratch vector (no per-episode targets,
# phases, or obstacle slots) — likewise skipped in the autoreset select.
_FIXED_AUX_FAMILIES = frozenset(
    {
        "empty",
        "doorkey",
        "fourrooms",
        "crossing",
        "distshift",
        "lavagap",
        "multiroom",
        "playground",
        "lockedroom",
    }
)


def _reg(env_id: str, factory, **kwargs) -> None:
    name = getattr(factory, "__name__", "misc")
    fam = name[5:] if name.startswith("make_") else name

    def build() -> Environment:
        env = factory(env_id, **kwargs)
        if not env_id.startswith("BabyAI-"):
            flags = {"no_marks": True}
            if fam in _BOX_FREE_FAMILIES:
                flags["no_boxes"] = True
            if fam in _FIXED_MISSION_FAMILIES:
                flags["fixed_mission"] = True
            if fam in _FIXED_AUX_FAMILIES:
                flags["fixed_aux"] = True
            env.params = env.params.with_extra(**flags)
        return env

    register(env_id, build)
    _FAMILY[env_id] = fam


def _register_all() -> None:
    """Mirror of the reference's MiniGrid-* registration table
    (/root/reference/minigrid/__init__.py:23-690), same ids and kwargs."""
    from minigrid_dynamicprogramming_tpu.envs.crossing import make_crossing
    from minigrid_dynamicprogramming_tpu.envs.distshift import make_distshift
    from minigrid_dynamicprogramming_tpu.envs.doorkey import make_doorkey
    from minigrid_dynamicprogramming_tpu.envs.dynamicobstacles import (
        make_dynamicobstacles,
    )
    from minigrid_dynamicprogramming_tpu.envs.empty import make_empty
    from minigrid_dynamicprogramming_tpu.envs.fetch import make_fetch
    from minigrid_dynamicprogramming_tpu.envs.fourrooms import make_fourrooms
    from minigrid_dynamicprogramming_tpu.envs.gotodoor import make_gotodoor
    from minigrid_dynamicprogramming_tpu.envs.gotoobject import make_gotoobject
    from minigrid_dynamicprogramming_tpu.envs.lavagap import make_lavagap
    from minigrid_dynamicprogramming_tpu.envs.lockedroom import make_lockedroom
    from minigrid_dynamicprogramming_tpu.envs.memory import make_memory
    from minigrid_dynamicprogramming_tpu.envs.playground import make_playground
    from minigrid_dynamicprogramming_tpu.envs.putnear import make_putnear
    from minigrid_dynamicprogramming_tpu.envs.redbluedoors import (
        make_redbluedoors,
    )

    # Crossing (__init__.py:35-82)
    for size, n in [(9, 1), (9, 2), (9, 3), (11, 5)]:
        _reg(
            f"MiniGrid-LavaCrossingS{size}N{n}-v0",
            make_crossing,
            size=size,
            num_crossings=n,
            obstacle="lava",
        )
        _reg(
            f"MiniGrid-SimpleCrossingS{size}N{n}-v0",
            make_crossing,
            size=size,
            num_crossings=n,
            obstacle="wall",
        )

    # DistShift (__init__.py:89-97)
    _reg("MiniGrid-DistShift1-v0", make_distshift, strip2_row=2)
    _reg("MiniGrid-DistShift2-v0", make_distshift, strip2_row=5)

    # DoorKey (__init__.py:104-124)
    for size in (5, 6, 8, 16):
        _reg(f"MiniGrid-DoorKey-{size}x{size}-v0", make_doorkey, size=size)

    # DynamicObstacles (__init__.py:131-162)
    _reg(
        "MiniGrid-Dynamic-Obstacles-5x5-v0",
        make_dynamicobstacles,
        size=5,
        n_obstacles=2,
    )
    _reg(
        "MiniGrid-Dynamic-Obstacles-Random-5x5-v0",
        make_dynamicobstacles,
        size=5,
        agent_start_pos=None,
        n_obstacles=2,
    )
    _reg(
        "MiniGrid-Dynamic-Obstacles-6x6-v0",
        make_dynamicobstacles,
        size=6,
        n_obstacles=3,
    )
    _reg(
        "MiniGrid-Dynamic-Obstacles-Random-6x6-v0",
        make_dynamicobstacles,
        size=6,
        agent_start_pos=None,
        n_obstacles=3,
    )
    _reg("MiniGrid-Dynamic-Obstacles-8x8-v0", make_dynamicobstacles, size=8)
    _reg(
        "MiniGrid-Dynamic-Obstacles-16x16-v0",
        make_dynamicobstacles,
        size=16,
        n_obstacles=8,
    )

    # Empty (__init__.py:169-200)
    for size in (5, 6, 8, 16):
        _reg(f"MiniGrid-Empty-{size}x{size}-v0", make_empty, size=size)
    for size in (5, 6):
        _reg(
            f"MiniGrid-Empty-Random-{size}x{size}-v0",
            make_empty,
            size=size,
            agent_start_pos=None,
        )

    # Fetch (__init__.py:207-218)
    _reg("MiniGrid-Fetch-5x5-N2-v0", make_fetch, size=5, num_objs=2)
    _reg("MiniGrid-Fetch-6x6-N2-v0", make_fetch, size=6, num_objs=2)
    _reg("MiniGrid-Fetch-8x8-N3-v0", make_fetch)

    # FourRooms (__init__.py:224-226)
    _reg("MiniGrid-FourRooms-v0", make_fourrooms)

    # GoToDoor (__init__.py:232-245)
    for size in (5, 6, 8):
        _reg(f"MiniGrid-GoToDoor-{size}x{size}-v0", make_gotodoor, size=size)

    # GoToObject (__init__.py:252-259)
    _reg("MiniGrid-GoToObject-6x6-N2-v0", make_gotoobject)
    _reg("MiniGrid-GoToObject-8x8-N2-v0", make_gotoobject, size=8, num_objs=2)

    # LavaGap (__init__.py:305-319)
    for size in (5, 6, 7):
        _reg(f"MiniGrid-LavaGapS{size}-v0", make_lavagap, size=size)

    # LockedRoom (__init__.py:326-328)
    _reg("MiniGrid-LockedRoom-v0", make_lockedroom)

    # Memory (__init__.py:334-366)
    _reg("MiniGrid-MemoryS17Random-v0", make_memory, size=17, random_length=True)
    _reg("MiniGrid-MemoryS13Random-v0", make_memory, size=13, random_length=True)
    for size in (13, 11, 9, 7):
        _reg(f"MiniGrid-MemoryS{size}-v0", make_memory, size=size)

    # Playground (__init__.py)
    _reg("MiniGrid-Playground-v0", make_playground)

    # PutNear (__init__.py)
    _reg("MiniGrid-PutNear-6x6-N2-v0", make_putnear)
    _reg("MiniGrid-PutNear-8x8-N3-v0", make_putnear, size=8, num_objs=3)

    # RedBlueDoors (__init__.py)
    _reg("MiniGrid-RedBlueDoors-6x6-v0", make_redbluedoors, size=6)
    _reg("MiniGrid-RedBlueDoors-8x8-v0", make_redbluedoors)

    from minigrid_dynamicprogramming_tpu.envs.keycorridor import (
        make_keycorridor,
    )
    from minigrid_dynamicprogramming_tpu.envs.multiroom import make_multiroom
    from minigrid_dynamicprogramming_tpu.envs.obstructedmaze import (
        make_obstructedmaze_1d,
        make_obstructedmaze_full,
    )
    from minigrid_dynamicprogramming_tpu.envs.unlock import (
        make_blockedunlockpickup,
        make_unlock,
        make_unlockpickup,
    )

    # KeyCorridor (__init__.py:266-298)
    for rs, nr in [(3, 1), (3, 2), (3, 3), (4, 3), (5, 3), (6, 3)]:
        _reg(
            f"MiniGrid-KeyCorridorS{rs}R{nr}-v0",
            make_keycorridor,
            room_size=rs,
            num_rows=nr,
        )

    # MultiRoom (__init__.py:373-389 — N4-S5 really registers 6 rooms)
    _reg(
        "MiniGrid-MultiRoom-N2-S4-v0",
        make_multiroom,
        min_num_rooms=2,
        max_num_rooms=2,
        max_room_size=4,
    )
    _reg(
        "MiniGrid-MultiRoom-N4-S5-v0",
        make_multiroom,
        min_num_rooms=6,
        max_num_rooms=6,
        max_room_size=5,
    )
    _reg(
        "MiniGrid-MultiRoom-N6-v0",
        make_multiroom,
        min_num_rooms=6,
        max_num_rooms=6,
    )

    # ObstructedMaze (__init__.py:394-520)
    _reg(
        "MiniGrid-ObstructedMaze-1Dl-v0",
        make_obstructedmaze_1d,
        key_in_box=False,
        blocked=False,
    )
    _reg(
        "MiniGrid-ObstructedMaze-1Dlh-v0",
        make_obstructedmaze_1d,
        key_in_box=True,
        blocked=False,
    )
    _reg(
        "MiniGrid-ObstructedMaze-1Dlhb-v0",
        make_obstructedmaze_1d,
        key_in_box=True,
        blocked=True,
    )
    for ver in ("v0", "v1"):
        v1 = ver == "v1"
        if not v1:
            _reg(
                "MiniGrid-ObstructedMaze-2Dl-v0",
                make_obstructedmaze_full,
                agent_room=(2, 1), key_in_box=False, blocked=False,
                num_quarters=1, num_rooms_visited=4,
            )
            _reg(
                "MiniGrid-ObstructedMaze-2Dlh-v0",
                make_obstructedmaze_full,
                agent_room=(2, 1), key_in_box=True, blocked=False,
                num_quarters=1, num_rooms_visited=4,
            )
        _reg(
            f"MiniGrid-ObstructedMaze-2Dlhb-{ver}",
            make_obstructedmaze_full,
            agent_room=(2, 1), key_in_box=True, blocked=True,
            num_quarters=1, num_rooms_visited=4, v1=v1,
        )
        _reg(
            f"MiniGrid-ObstructedMaze-1Q-{ver}",
            make_obstructedmaze_full,
            agent_room=(1, 1), key_in_box=True, blocked=True,
            num_quarters=1, num_rooms_visited=5, v1=v1,
        )
        _reg(
            f"MiniGrid-ObstructedMaze-2Q-{ver}",
            make_obstructedmaze_full,
            agent_room=(2, 1), key_in_box=True, blocked=True,
            num_quarters=2, num_rooms_visited=11, v1=v1,
        )
        _reg(
            f"MiniGrid-ObstructedMaze-Full-{ver}",
            make_obstructedmaze_full,
            v1=v1,
        )

    # Unlock family (__init__.py:28-30, 184, 190-192)
    _reg("MiniGrid-Unlock-v0", make_unlock)
    _reg("MiniGrid-UnlockPickup-v0", make_unlockpickup)
    _reg("MiniGrid-BlockedUnlockPickup-v0", make_blockedunlockpickup)

    _register_babyai()


def _register_babyai() -> None:
    """BabyAI-* ids (reference minigrid/__init__.py:694-1130)."""
    from minigrid_dynamicprogramming_tpu.envs.babyai.goto import (
        make_goto,
        make_goto_door,
        make_goto_imp_unlock,
        make_goto_local,
        make_goto_obj,
        make_goto_obj_door,
        make_goto_red_ball,
        make_goto_red_ball_grey,
        make_goto_red_blue_ball,
    )

    _reg("BabyAI-GoToRedBallGrey-v0", make_goto_red_ball_grey)
    _reg("BabyAI-GoToRedBall-v0", make_goto_red_ball)
    _reg("BabyAI-GoToRedBallNoDists-v0", make_goto_red_ball, num_dists=0)
    _reg("BabyAI-GoToObj-v0", make_goto_obj)
    _reg("BabyAI-GoToObjS4-v0", make_goto_obj, room_size=4)
    _reg("BabyAI-GoToObjS6-v1", make_goto_obj, room_size=6)
    _reg("BabyAI-GoToLocal-v0", make_goto_local)
    for rs, nd in [(5, 2), (6, 2), (6, 3), (6, 4), (7, 4), (7, 5),
                   (8, 2), (8, 3), (8, 4), (8, 5), (8, 6), (8, 7)]:
        _reg(
            f"BabyAI-GoToLocalS{rs}N{nd}-v0",
            make_goto_local, room_size=rs, num_dists=nd,
        )
    _reg("BabyAI-GoTo-v0", make_goto)
    _reg("BabyAI-GoToOpen-v0", make_goto, doors_open=True)
    _reg("BabyAI-GoToObjMaze-v0", make_goto, num_dists=1)
    _reg("BabyAI-GoToObjMazeOpen-v0", make_goto, num_dists=1, doors_open=True)
    _reg("BabyAI-GoToObjMazeS4R2-v0", make_goto, num_dists=1, room_size=4,
         num_rows=2, num_cols=2)
    for rs in (4, 5, 6, 7):
        _reg(f"BabyAI-GoToObjMazeS{rs}-v0", make_goto, num_dists=1, room_size=rs)
    _reg("BabyAI-GoToImpUnlock-v0", make_goto_imp_unlock)
    _reg("BabyAI-GoToRedBlueBall-v0", make_goto_red_blue_ball)
    _reg("BabyAI-GoToDoor-v0", make_goto_door)
    _reg("BabyAI-GoToObjDoor-v0", make_goto_obj_door)

    from minigrid_dynamicprogramming_tpu.envs.babyai.open import (
        make_open,
        make_open_door,
        make_open_doors_order,
        make_open_red_door,
        make_open_two_doors,
    )

    _reg("BabyAI-Open-v0", make_open)
    _reg("BabyAI-OpenRedDoor-v0", make_open_red_door)
    _reg("BabyAI-OpenDoor-v0", make_open_door)
    _reg("BabyAI-OpenDoorColor-v0", make_open_door, select_by="color")
    _reg("BabyAI-OpenDoorLoc-v0", make_open_door, select_by="loc")
    _reg("BabyAI-OpenDoorDebug-v0", make_open_door, debug=True, select_by=None)
    _reg("BabyAI-OpenTwoDoors-v0", make_open_two_doors)
    _reg(
        "BabyAI-OpenRedBlueDoors-v0",
        make_open_two_doors, first_color="red", second_color="blue",
    )
    _reg(
        "BabyAI-OpenRedBlueDoorsDebug-v0",
        make_open_two_doors, first_color="red", second_color="blue", strict=True,
    )
    _reg("BabyAI-OpenDoorsOrderN2-v0", make_open_doors_order, num_doors=2)
    _reg("BabyAI-OpenDoorsOrderN4-v0", make_open_doors_order, num_doors=4)
    _reg(
        "BabyAI-OpenDoorsOrderN2Debug-v0",
        make_open_doors_order, num_doors=2, debug=True,
    )
    _reg(
        "BabyAI-OpenDoorsOrderN4Debug-v0",
        make_open_doors_order, num_doors=4, debug=True,
    )

    from minigrid_dynamicprogramming_tpu.envs.babyai.pickup import (
        make_pickup,
        make_pickup_above,
        make_pickup_dist,
        make_putnext,
        make_putnext_local,
        make_unblock_pickup,
    )

    _reg("BabyAI-Pickup-v0", make_pickup)
    _reg("BabyAI-UnblockPickup-v0", make_unblock_pickup)
    _reg("BabyAI-PickupDist-v0", make_pickup_dist)
    _reg("BabyAI-PickupDistDebug-v0", make_pickup_dist, debug=True)
    _reg("BabyAI-PickupAbove-v0", make_pickup_above)
    _reg("BabyAI-PutNextLocal-v0", make_putnext_local)
    _reg("BabyAI-PutNextLocalS5N3-v0", make_putnext_local, room_size=5, num_objs=3)
    _reg("BabyAI-PutNextLocalS6N4-v0", make_putnext_local, room_size=6, num_objs=4)
    for rs, n in [(4, 1), (5, 1), (5, 2), (6, 3), (7, 4)]:
        _reg(f"BabyAI-PutNextS{rs}N{n}-v0", make_putnext, room_size=rs,
             objs_per_room=n)
    for rs, n in [(5, 2), (6, 3), (7, 4)]:
        _reg(
            f"BabyAI-PutNextS{rs}N{n}Carrying-v0",
            make_putnext, room_size=rs, objs_per_room=n, start_carrying=True,
        )

    from minigrid_dynamicprogramming_tpu.envs.babyai.unlock import (
        make_blocked_unlock_pickup,
        make_key_in_box,
        make_unlock,
        make_unlock_local,
        make_unlock_pickup,
        make_unlock_to_unlock,
    )

    _reg("BabyAI-Unlock-v0", make_unlock)
    _reg("BabyAI-UnlockLocal-v0", make_unlock_local)
    _reg("BabyAI-UnlockLocalDist-v0", make_unlock_local, distractors=True)
    _reg("BabyAI-KeyInBox-v0", make_key_in_box)
    _reg("BabyAI-UnlockPickup-v0", make_unlock_pickup)
    _reg("BabyAI-UnlockPickupDist-v0", make_unlock_pickup, distractors=True)
    _reg("BabyAI-BlockedUnlockPickup-v0", make_blocked_unlock_pickup)
    _reg("BabyAI-UnlockToUnlock-v0", make_unlock_to_unlock)

    from minigrid_dynamicprogramming_tpu.envs.babyai.other import (
        make_action_obj_door,
        make_find_obj,
        make_key_corridor,
        make_move_two_across,
        make_one_room,
    )

    _reg("BabyAI-ActionObjDoor-v0", make_action_obj_door)
    for rs in (5, 6, 7):
        _reg(f"BabyAI-FindObjS{rs}-v0", make_find_obj, room_size=rs)
    _reg("BabyAI-KeyCorridor-v0", make_key_corridor)
    _reg("BabyAI-KeyCorridorS3R1-v0", make_key_corridor, room_size=3, num_rows=1)
    _reg("BabyAI-KeyCorridorS3R2-v0", make_key_corridor, room_size=3, num_rows=2)
    _reg("BabyAI-KeyCorridorS3R3-v0", make_key_corridor, room_size=3, num_rows=3)
    _reg("BabyAI-KeyCorridorS4R3-v0", make_key_corridor, room_size=4, num_rows=3)
    _reg("BabyAI-KeyCorridorS5R3-v0", make_key_corridor, room_size=5, num_rows=3)
    _reg("BabyAI-KeyCorridorS6R3-v0", make_key_corridor, room_size=6, num_rows=3)
    for rs in (8, 12, 16, 20):
        _reg(f"BabyAI-OneRoomS{rs}-v0", make_one_room, room_size=rs)
    _reg(
        "BabyAI-MoveTwoAcrossS5N2-v0",
        make_move_two_across, room_size=5, objs_per_room=2,
    )
    _reg(
        "BabyAI-MoveTwoAcrossS8N9-v0",
        make_move_two_across, room_size=8, objs_per_room=9,
    )

    from minigrid_dynamicprogramming_tpu.envs.babyai.levelgen import (
        make_levelgen,
    )

    _reg("BabyAI-GoToSeq-v0", make_levelgen, action_kinds=("goto",),
         locked_room_prob=0, locations=False, unblocking=False)
    _reg("BabyAI-GoToSeqS5R2-v0", make_levelgen, action_kinds=("goto",),
         locked_room_prob=0, locations=False, unblocking=False,
         room_size=5, num_rows=2, num_cols=2, num_dists=4)
    _reg("BabyAI-PickupLoc-v0", make_levelgen, action_kinds=("pickup",),
         instr_kinds=("action",), num_rows=1, num_cols=1, num_dists=8,
         locked_room_prob=0, locations=True, unblocking=False)
    _reg("BabyAI-Synth-v0", make_levelgen, instr_kinds=("action",),
         locations=False, unblocking=True, implicit_unlock=False)
    _reg("BabyAI-SynthS5R2-v0", make_levelgen, instr_kinds=("action",),
         locations=False, unblocking=True, implicit_unlock=False,
         room_size=5, num_rows=2)
    _reg("BabyAI-SynthLoc-v0", make_levelgen, instr_kinds=("action",),
         locations=True, unblocking=True, implicit_unlock=False)
    _reg("BabyAI-SynthSeq-v0", make_levelgen, locations=True,
         unblocking=True, implicit_unlock=False)
    _reg("BabyAI-MiniBossLevel-v0", make_levelgen, num_cols=2, num_rows=2,
         room_size=5, num_dists=7, locked_room_prob=0.25)
    _reg("BabyAI-BossLevel-v0", make_levelgen)
    _reg("BabyAI-BossLevelNoUnlock-v0", make_levelgen, locked_room_prob=0,
         implicit_unlock=False)


_register_all()
