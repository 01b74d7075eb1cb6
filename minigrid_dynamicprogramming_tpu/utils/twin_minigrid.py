"""Seed-parity twin generators for the remaining MiniGrid families.

Extends the draw-order twin (see utils/parity_twin.py) to every registered
``MiniGrid-*`` id: DistShift, LavaGap, Fetch, GoToDoor/GoToObject, PutNear,
RedBlueDoors, Memory, LockedRoom, MultiRoom, Playground, and the RoomGrid
families (KeyCorridor, Unlock/UnlockPickup/BlockedUnlockPickup,
ObstructedMaze v0+v1).  Each generator replays the reference ``_gen_grid``'s
PCG64 draw order exactly (citations inline), so ``twin_layout(env_id, seed)``
reproduces ``env.reset(seed)``'s layout without importing the reference.

``extra["aux_map"]`` / ``extra["mission_map"]`` carry the episode constants
the device step hooks read from ``state.aux`` / ``state.mission`` (slot
layouts mirror envs/<family>.py and utils/parity.py:aux_from_reference).
"""

from __future__ import annotations

from typing import Optional, Tuple

from minigrid_dynamicprogramming_tpu.core.constants import (
    COLOR_NAMES,
    COLOR_TO_IDX,
    OBJECT_TO_IDX,
)
from minigrid_dynamicprogramming_tpu.utils.parity_twin import (
    RoomGridTwin,
    TwinEnv,
    TwinLayout,
    TwinObj,
    _DIR_VEC,
    _twin,
    _wall,
)

_TYPE_IDX = OBJECT_TO_IDX  # name -> code ("key"->5, "ball"->6, "box"->7, ...)


# ---------------------------------------------------------------------------
# Single-room / corridor families
# ---------------------------------------------------------------------------


def gen_distshift(seed, strip2_row, width=9, height=7) -> TwinLayout:
    """envs/distshift.py:99-120 — fully deterministic (no draws)."""
    t = TwinEnv(width, height, seed)
    t.wall_rect(0, 0, width, height)
    t.put_obj(TwinObj("goal", "green"), width - 2, 1)
    for i in range(width - 6):
        t.set(3 + i, 1, TwinObj("lava", "red"))
        t.set(3 + i, strip2_row, TwinObj("lava", "red"))
    t.agent_pos, t.agent_dir = (1, 1), 0
    return TwinLayout(t)


def gen_lavagap(seed, size) -> TwinLayout:
    """envs/lavagap.py:104-131 — two draws (gap x then y)."""
    t = TwinEnv(size, size, seed)
    t.wall_rect(0, 0, size, size)
    t.agent_pos, t.agent_dir = (1, 1), 0
    t.put_obj(TwinObj("goal", "green"), size - 2, size - 2)
    gx = t.rand_int(2, size - 2)
    gy = t.rand_int(1, size - 1)
    for j in range(size - 2):  # grid.vert_wall(gx, 1, size-2, Lava)
        t.set(gx, 1 + j, TwinObj("lava", "red"))
    t.set(gx, gy, None)
    return TwinLayout(t)


def gen_fetch(seed, size, num_objs) -> TwinLayout:
    """envs/fetch.py:108-159 — type/color draws per object (duplicates
    allowed), place_obj, place_agent, target index, syntax index."""
    t = TwinEnv(size, size, seed)
    t.horz_wall(0, 0)
    t.horz_wall(0, size - 1)
    t.vert_wall(0, 0)
    t.vert_wall(size - 1, 0)
    objs = []
    while len(objs) < num_objs:
        obj_type = t.rand_elem(["key", "ball"])
        obj_color = t.rand_elem(COLOR_NAMES)
        obj = TwinObj(obj_type, obj_color)
        t.place_obj(obj)
        objs.append(obj)
    t.place_agent_rect()
    target = objs[t.rand_int(0, len(objs))]
    syntax = t.rand_int(0, 5)
    return TwinLayout(
        t,
        aux_map={0: _TYPE_IDX[target.type], 1: COLOR_TO_IDX[target.color]},
        mission_map={
            0: syntax,
            1: COLOR_TO_IDX[target.color],
            2: _TYPE_IDX[target.type],
        },
    )


def gen_gotodoor(seed, size) -> TwinLayout:
    """envs/gotodoor.py:92-131 — room dims redrawn, 4 door-pos draws,
    4+ color draws (duplicates retried), agent, target index."""
    t = TwinEnv(size, size, seed)
    width = t.rand_int(5, size + 1)
    height = t.rand_int(5, size + 1)
    t.wall_rect(0, 0, width, height)
    door_pos = [
        (t.rand_int(2, width - 2), 0),
        (t.rand_int(2, width - 2), height - 1),
        (0, t.rand_int(2, height - 2)),
        (width - 1, t.rand_int(2, height - 2)),
    ]
    door_colors = []
    while len(door_colors) < len(door_pos):
        color = t.rand_elem(COLOR_NAMES)
        if color in door_colors:
            continue
        door_colors.append(color)
    for pos, color in zip(door_pos, door_colors):
        t.set(pos[0], pos[1], TwinObj("door", color, state=1))
    t.place_agent_rect(size=(width, height))
    idx = t.rand_int(0, len(door_pos))
    return TwinLayout(
        t,
        aux_map={0: door_pos[idx][0], 1: door_pos[idx][1]},
        mission_map={0: COLOR_TO_IDX[door_colors[idx]]},
    )


def gen_gotoobject(seed, size, num_objs) -> TwinLayout:
    """envs/gotoobject.py:95-142 — unique (type,color) retry consumes the
    two draws, then place; agent; target index."""
    t = TwinEnv(size, size, seed)
    t.wall_rect(0, 0, size, size)
    objs = []
    obj_pos = []
    while len(objs) < num_objs:
        obj_type = t.rand_elem(["key", "ball", "box"])
        obj_color = t.rand_elem(COLOR_NAMES)
        if (obj_type, obj_color) in objs:
            continue
        pos = t.place_obj(TwinObj(obj_type, obj_color))
        objs.append((obj_type, obj_color))
        obj_pos.append(pos)
    t.place_agent_rect()
    idx = t.rand_int(0, len(objs))
    return TwinLayout(
        t,
        aux_map={0: obj_pos[idx][0], 1: obj_pos[idx][1]},
        mission_map={0: COLOR_TO_IDX[objs[idx][1]], 1: _TYPE_IDX[objs[idx][0]]},
    )


def gen_putnear(seed, size, num_objs) -> TwinLayout:
    """envs/putnear.py:103-173 — near_obj reject filter over already-placed
    positions; move + target index draws (target resampled while == move)."""
    t = TwinEnv(size, size, seed)
    t.horz_wall(0, 0)
    t.horz_wall(0, size - 1)
    t.vert_wall(0, 0)
    t.vert_wall(size - 1, 0)
    objs = []
    obj_pos = []

    def near_obj(env, p1):
        for p2 in obj_pos:
            if abs(p1[0] - p2[0]) <= 1 and abs(p1[1] - p2[1]) <= 1:
                return True
        return False

    while len(objs) < num_objs:
        obj_type = t.rand_elem(["key", "ball", "box"])
        obj_color = t.rand_elem(COLOR_NAMES)
        if (obj_type, obj_color) in objs:
            continue
        pos = t.place_obj(TwinObj(obj_type, obj_color), reject_fn=near_obj)
        objs.append((obj_type, obj_color))
        obj_pos.append(pos)
    t.place_agent_rect()
    move_idx = t.rand_int(0, len(objs))
    while True:
        target_idx = t.rand_int(0, len(objs))
        if target_idx != move_idx:
            break
    return TwinLayout(
        t,
        aux_map={
            0: _TYPE_IDX[objs[move_idx][0]],
            1: COLOR_TO_IDX[objs[move_idx][1]],
            2: obj_pos[target_idx][0],
            3: obj_pos[target_idx][1],
        },
        mission_map={
            0: COLOR_TO_IDX[objs[move_idx][1]],
            1: _TYPE_IDX[objs[move_idx][0]],
            2: COLOR_TO_IDX[objs[target_idx][1]],
            3: _TYPE_IDX[objs[target_idx][0]],
        },
    )


def gen_redbluedoors(seed, size) -> TwinLayout:
    """envs/redbluedoors.py:82-113 — agent in the middle room, then the red
    and blue door row draws."""
    t = TwinEnv(2 * size, size, seed)
    t.wall_rect(0, 0, 2 * size, size)
    t.wall_rect(size // 2, 0, size, size)
    t.place_agent_rect(top=(size // 2, 0), size=(size, size))
    red_y = t.rand_int(1, size - 1)
    t.set(size // 2, red_y, TwinObj("door", "red", state=1))
    blue_y = t.rand_int(1, size - 1)
    t.set(size // 2 + size - 1, blue_y, TwinObj("door", "blue", state=1))
    return TwinLayout(
        t,
        aux_map={
            0: size // 2,
            1: red_y,
            2: size // 2 + size - 1,
            3: blue_y,
        },
    )


def gen_memory(seed, size, random_length=False) -> TwinLayout:
    """envs/memory.py:94-150 — hallway-end draw (random_length only), agent
    x draw, start-object class draw, end-object order draw."""
    t = TwinEnv(size, size, seed)
    t.horz_wall(0, 0)
    t.horz_wall(0, size - 1)
    t.vert_wall(0, 0)
    t.vert_wall(size - 1, 0)
    upper = size // 2 - 2
    lower = size // 2 + 2
    hallway_end = t.rand_int(4, size - 2) if random_length else size - 3
    for i in range(1, 5):
        t.set(i, upper, _wall())
        t.set(i, lower, _wall())
    t.set(4, upper + 1, _wall())
    t.set(4, lower - 1, _wall())
    for i in range(5, hallway_end):
        t.set(i, upper + 1, _wall())
        t.set(i, lower - 1, _wall())
    for j in range(size):
        if j != size // 2:
            t.set(hallway_end, j, _wall())
        t.set(hallway_end + 2, j, _wall())
    t.agent_pos = (t.rand_int(1, hallway_end + 1), size // 2)
    t.agent_dir = 0
    start_obj = t.rand_elem(["key", "ball"])
    t.set(1, size // 2 - 1, TwinObj(start_obj, "green"))
    other_objs = t.rand_elem([["ball", "key"], ["key", "ball"]])
    pos0 = (hallway_end + 1, size // 2 - 2)
    pos1 = (hallway_end + 1, size // 2 + 2)
    t.set(pos0[0], pos0[1], TwinObj(other_objs[0], "green"))
    t.set(pos1[0], pos1[1], TwinObj(other_objs[1], "green"))
    if start_obj == other_objs[0]:
        success = (pos0[0], pos0[1] + 1)
        failure = (pos1[0], pos1[1] - 1)
    else:
        success = (pos1[0], pos1[1] - 1)
        failure = (pos0[0], pos0[1] + 1)
    return TwinLayout(
        t,
        aux_map={0: success[0], 1: success[1], 2: failure[0], 3: failure[1]},
    )


def gen_lockedroom(seed, size=19) -> TwinLayout:
    """envs/lockedroom.py:102-174 — locked-room elem draw, goal pos, six
    door colors (sorted-set removal), key room loop, key pos, agent."""
    t = TwinEnv(size, size, seed)
    for i in range(size):
        t.set(i, 0, _wall())
        t.set(i, size - 1, _wall())
    for j in range(size):
        t.set(0, j, _wall())
        t.set(size - 1, j, _wall())
    l_idx, r_idx = size // 2 - 2, size // 2 + 2
    for j in range(size):
        t.set(l_idx, j, _wall())
        t.set(r_idx, j, _wall())

    rooms = []  # (top, size, door_pos)
    for n in range(3):
        j = n * (size // 3)
        for i in range(l_idx):
            t.set(i, j, _wall())
        for i in range(r_idx, size):
            t.set(i, j, _wall())
        room_w, room_h = l_idx + 1, size // 3 + 1
        rooms.append([(0, j), (room_w, room_h), (l_idx, j + 3)])
        rooms.append([(r_idx, j), (room_w, room_h), (r_idx, j + 3)])

    def rand_pos_in(room):
        (tx, ty), (sw, sh), _ = room
        return t.rand_pos(tx + 1, tx + sw - 1, ty + 1, ty + sh - 1)

    locked = t.rand_elem(rooms)
    goal = rand_pos_in(locked)
    t.set(goal[0], goal[1], TwinObj("goal", "green"))
    colors = set(COLOR_NAMES)
    room_colors = {}
    for room in rooms:
        color = t.rand_elem(sorted(colors))
        colors.remove(color)
        room_colors[id(room)] = color
        dx, dy = room[2]
        is_locked = room is locked
        t.set(dx, dy, TwinObj("door", color, state=2 if is_locked else 1))
    while True:
        key_room = t.rand_elem(rooms)
        if key_room is not locked:
            break
    key_pos = rand_pos_in(key_room)
    t.set(key_pos[0], key_pos[1], TwinObj("key", room_colors[id(locked)]))
    t.place_agent_rect(top=(l_idx, 0), size=(r_idx - l_idx, size))
    return TwinLayout(
        t,
        mission_map={
            0: COLOR_TO_IDX[room_colors[id(locked)]],
            1: COLOR_TO_IDX[room_colors[id(key_room)]],
        },
    )


# ---------------------------------------------------------------------------
# MultiRoom — recursive room-chain placement (envs/multiroom.py:112-281)
# ---------------------------------------------------------------------------


def gen_multiroom(seed, min_rooms, max_rooms, max_room_size=10, size=25):
    t = TwinEnv(size, size, seed)
    num_rooms = t.rand_int(min_rooms, max_rooms + 1)

    room_list: list = []
    while len(room_list) < num_rooms:
        cur_list: list = []
        entry_pos = (t.rand_int(0, size - 2), t.rand_int(0, size - 2))
        _place_room(t, num_rooms, cur_list, 4, max_room_size, 2, entry_pos)
        if len(cur_list) > len(room_list):
            room_list = cur_list

    t._init_grid()
    wall = _wall()
    prev_color: Optional[str] = None
    for idx, room in enumerate(room_list):
        (top_x, top_y), (size_x, size_y), entry = room
        for i in range(size_x):
            t.cells[top_y][top_x + i] = wall
            t.cells[top_y + size_y - 1][top_x + i] = wall
        for j in range(size_y):
            t.cells[top_y + j][top_x] = wall
            t.cells[top_y + j][top_x + size_x - 1] = wall
        if idx > 0:
            door_colors = set(COLOR_NAMES)
            if prev_color:
                door_colors.remove(prev_color)
            color = t.rand_elem(sorted(door_colors))
            t.set(entry[0], entry[1], TwinObj("door", color, state=1))
            prev_color = color
    t.place_agent_rect(room_list[0][0], room_list[0][1])
    t.place_obj(TwinObj("goal", "green"), room_list[-1][0], room_list[-1][1])
    return TwinLayout(t)


def _place_room(t, num_left, room_list, min_sz, max_sz, entry_wall, entry_pos):
    """envs/multiroom.py:187-281 — draw order: sizeX, sizeY, top offset,
    then up to 8 (exit-wall, exit-pos) retries per child."""
    size_x = t.rand_int(min_sz, max_sz + 1)
    size_y = t.rand_int(min_sz, max_sz + 1)
    if len(room_list) == 0:
        top_x, top_y = entry_pos
    elif entry_wall == 0:
        top_x = entry_pos[0] - size_x + 1
        top_y = t.rand_int(entry_pos[1] - size_y + 2, entry_pos[1])
    elif entry_wall == 1:
        top_x = t.rand_int(entry_pos[0] - size_x + 2, entry_pos[0])
        top_y = entry_pos[1] - size_y + 1
    elif entry_wall == 2:
        top_x = entry_pos[0]
        top_y = t.rand_int(entry_pos[1] - size_y + 2, entry_pos[1])
    elif entry_wall == 3:
        top_x = t.rand_int(entry_pos[0] - size_x + 2, entry_pos[0])
        top_y = entry_pos[1]
    else:
        raise AssertionError(entry_wall)

    if top_x < 0 or top_y < 0:
        return False
    if top_x + size_x > t.width or top_y + size_y >= t.height:
        return False
    for (rx, ry), (rw, rh), _ in room_list[:-1]:
        non_overlap = (
            top_x + size_x < rx
            or rx + rw <= top_x
            or top_y + size_y < ry
            or ry + rh <= top_y
        )
        if not non_overlap:
            return False

    room_list.append([(top_x, top_y), (size_x, size_y), entry_pos])
    if num_left == 1:
        return True

    for _ in range(8):
        wall_set = {0, 1, 2, 3}
        wall_set.remove(entry_wall)
        exit_wall = t.rand_elem(sorted(wall_set))
        next_entry_wall = (exit_wall + 2) % 4
        if exit_wall == 0:
            exit_pos = (top_x + size_x - 1, top_y + t.rand_int(1, size_y - 1))
        elif exit_wall == 1:
            exit_pos = (top_x + t.rand_int(1, size_x - 1), top_y + size_y - 1)
        elif exit_wall == 2:
            exit_pos = (top_x, top_y + t.rand_int(1, size_y - 1))
        else:
            exit_pos = (top_x + t.rand_int(1, size_x - 1), top_y)
        if _place_room(
            t, num_left - 1, room_list, min_sz, max_sz, next_entry_wall, exit_pos
        ):
            break
    return True


def gen_playground(seed, size=19) -> TwinLayout:
    """envs/playground.py:40-91 — 3x3 rooms, door pos-then-color draws in
    (j, i) scan order, agent, 12 random objects."""
    t = TwinEnv(size, size, seed)
    t.horz_wall(0, 0)
    t.horz_wall(0, size - 1)
    t.vert_wall(0, 0)
    t.vert_wall(size - 1, 0)
    room_w, room_h = size // 3, size // 3
    for j in range(3):
        for i in range(3):
            x_l, y_t = i * room_w, j * room_h
            x_r, y_b = x_l + room_w, y_t + room_h
            if i + 1 < 3:
                for k in range(room_h):  # grid.vert_wall(xR, yT, roomH)
                    t.set(x_r, y_t + k, _wall())
                pos = (x_r, t.rand_int(y_t + 1, y_b - 1))
                color = t.rand_elem(COLOR_NAMES)
                t.set(pos[0], pos[1], TwinObj("door", color, state=1))
            if j + 1 < 3:
                for k in range(room_w):  # grid.horz_wall(xL, yB, roomW)
                    t.set(x_l + k, y_b, _wall())
                pos = (t.rand_int(x_l + 1, x_r - 1), y_b)
                color = t.rand_elem(COLOR_NAMES)
                t.set(pos[0], pos[1], TwinObj("door", color, state=1))
    t.place_agent_rect()
    for _ in range(12):
        obj_type = t.rand_elem(["key", "ball", "box"])
        obj_color = t.rand_elem(COLOR_NAMES)
        t.place_obj(TwinObj(obj_type, obj_color))
    return TwinLayout(t)


# ---------------------------------------------------------------------------
# RoomGrid MiniGrid families
# ---------------------------------------------------------------------------


def gen_keycorridor(seed, room_size=6, num_rows=3, obj_type="ball"):
    """envs/keycorridor.py:104-127."""
    t = RoomGridTwin(room_size, num_rows, 3, seed)
    t.gen_lattice()
    for j in range(1, num_rows):
        t.remove_wall(1, j, 3)
    room_idx = t.rand_int(0, num_rows)
    door, _ = t.add_door(2, room_idx, 2, locked=True)
    obj, _ = t.add_object(2, room_idx, kind=obj_type)
    t.add_object(0, t.rand_int(0, num_rows), "key", door.color)
    t.place_agent_room(1, num_rows // 2)
    t.connect_all()
    return TwinLayout(
        t,
        aux_map={0: _TYPE_IDX[obj.type], 1: COLOR_TO_IDX[obj.color]},
        mission_map={0: COLOR_TO_IDX[obj.color], 1: _TYPE_IDX[obj.type]},
    )


def gen_unlock(seed) -> TwinLayout:
    """envs/unlock.py:76-87."""
    t = RoomGridTwin(6, 1, 2, seed)
    t.gen_lattice()
    door, pos = t.add_door(0, 0, 0, locked=True)
    t.add_object(0, 0, "key", door.color)
    t.place_agent_room(0, 0)
    return TwinLayout(t, aux_map={0: pos[0], 1: pos[1]})


def gen_unlockpickup_mg(seed) -> TwinLayout:
    """envs/unlockpickup.py:83-96 (MiniGrid id — device aux is the target
    box type/color, unlike the BabyAI twin which carries an instruction)."""
    t = RoomGridTwin(6, 1, 2, seed)
    t.gen_lattice()
    obj, _ = t.add_object(1, 0, kind="box")
    door, _ = t.add_door(0, 0, 0, locked=True)
    t.add_object(0, 0, "key", door.color)
    t.place_agent_room(0, 0)
    return TwinLayout(
        t,
        aux_map={0: _TYPE_IDX["box"], 1: COLOR_TO_IDX[obj.color]},
        mission_map={0: COLOR_TO_IDX[obj.color]},
    )


def gen_blockedunlockpickup(seed) -> TwinLayout:
    """envs/blockedunlockpickup.py:90-106."""
    t = RoomGridTwin(6, 1, 2, seed)
    t.gen_lattice()
    obj, _ = t.add_object(1, 0, kind="box")
    door, pos = t.add_door(0, 0, 0, locked=True)
    color = t.rand_color()
    t.set(pos[0] - 1, pos[1], TwinObj("ball", color))
    t.add_object(0, 0, "key", door.color)
    t.place_agent_room(0, 0)
    return TwinLayout(
        t,
        aux_map={0: _TYPE_IDX["box"], 1: COLOR_TO_IDX[obj.color]},
        mission_map={0: COLOR_TO_IDX[obj.color]},
    )


# -- ObstructedMaze ----------------------------------------------------------


class _ObstructedTwin(RoomGridTwin):
    """ObstructedMazeEnv scaffolding (envs/obstructedmaze.py:112-167)."""

    def gen_base(self) -> None:
        self.gen_lattice()
        # rand_subset over all six colors: a full shuffle-by-draws
        self.door_colors = self.rand_subset(COLOR_NAMES, len(COLOR_NAMES))
        self.ball_to_find_color = COLOR_NAMES[0]
        self.blocking_ball_color = COLOR_NAMES[1]
        self.box_color = COLOR_NAMES[2]

    def add_door_om(
        self, i, j, door_idx=0, color=None, locked=False,
        key_in_box=False, blocked=False,
    ):
        door, pos = self.add_door(i, j, door_idx, color, locked)
        if blocked:
            vec = _DIR_VEC[door_idx]
            self.set(pos[0] - vec[0], pos[1] - vec[1],
                     TwinObj("ball", self.blocking_ball_color))
        if locked:
            obj = TwinObj("key", door.color)
            if key_in_box:
                obj = TwinObj("box", self.box_color, contains=obj)
            self.place_in_room(i, j, obj)
        return door, pos

    def add_locked_door_v1(self, i, j, door_idx=0, color=None, blocked=False):
        """obstructedmaze_v1.py:77-85 — door + blocker only, key deferred."""
        door, pos = self.add_door(i, j, door_idx, color, True)
        if blocked:
            vec = _DIR_VEC[door_idx]
            self.set(pos[0] - vec[0], pos[1] - vec[1],
                     TwinObj("ball", self.blocking_ball_color))
        return door, pos

    def add_key_v1(self, i, j, color=None, key_in_box=False):
        """obstructedmaze_v1.py:87-99."""
        obj = TwinObj("key", color)
        if key_in_box:
            obj = TwinObj("box", self.box_color, contains=obj)
        self.place_in_room(i, j, obj)


def _om_layout(t: _ObstructedTwin) -> TwinLayout:
    return TwinLayout(
        t,
        aux_map={0: _TYPE_IDX["ball"], 1: COLOR_TO_IDX[t.ball_to_find_color]},
        mission_map={0: COLOR_TO_IDX[t.ball_to_find_color]},
    )


def gen_obstructed_1dl(seed, key_in_box, blocked) -> TwinLayout:
    """ObstructedMaze_1Dlhb (envs/obstructedmaze.py:182-196), 1x2 rooms."""
    t = _ObstructedTwin(6, 1, 2, seed)
    t.gen_base()
    t.add_door_om(0, 0, door_idx=0, color=t.door_colors[0], locked=True,
                  key_in_box=key_in_box, blocked=blocked)
    t.add_object(1, 0, "ball", color=t.ball_to_find_color)
    t.place_agent_room(0, 0)
    return _om_layout(t)


_SIDE_ROOMS = [(2, 1), (1, 2), (0, 1), (1, 0)]
_CORNERS = [(2, 0), (2, 2), (0, 2), (0, 0)]


def gen_obstructed_full(seed, agent_room, key_in_box, blocked, num_quarters):
    """ObstructedMaze_Full v0 (envs/obstructedmaze.py:224-256), 3x3 rooms."""
    t = _ObstructedTwin(6, 3, 3, seed)
    t.gen_base()
    for i, side in enumerate(_SIDE_ROOMS[:num_quarters]):
        t.add_door(1, 1, door_idx=i, color=t.door_colors[i], locked=False)
        for k in (-1, 1):
            t.add_door_om(
                side[0], side[1], door_idx=(i + k) % 4,
                color=t.door_colors[(i + k) % len(t.door_colors)],
                locked=True, key_in_box=key_in_box, blocked=blocked,
            )
    ball_room = t.rand_elem(_CORNERS[:num_quarters])
    t.add_object(ball_room[0], ball_room[1], "ball", color=t.ball_to_find_color)
    t.place_agent_room(agent_room[0], agent_room[1])
    return _om_layout(t)


def gen_obstructed_full_v1(seed, agent_room, key_in_box, blocked, num_quarters):
    """ObstructedMaze_Full v1 (envs/obstructedmaze_v1.py:37-75): doors and
    blockers first, then keys, so a blocker can never bury a box."""
    t = _ObstructedTwin(6, 3, 3, seed)
    t.gen_base()
    for i, side in enumerate(_SIDE_ROOMS[:num_quarters]):
        t.add_door(1, 1, door_idx=i, color=t.door_colors[i], locked=False)
        for k in (-1, 1):
            t.add_locked_door_v1(
                side[0], side[1], door_idx=(i + k) % 4,
                color=t.door_colors[(i + k) % len(t.door_colors)],
                blocked=blocked,
            )
        for k in (-1, 1):
            t.add_key_v1(
                side[0], side[1],
                color=t.door_colors[(i + k) % len(t.door_colors)],
                key_in_box=key_in_box,
            )
    ball_room = t.rand_elem(_CORNERS[:num_quarters])
    t.add_object(ball_room[0], ball_room[1], "ball", color=t.ball_to_find_color)
    t.place_agent_room(agent_room[0], agent_room[1])
    return _om_layout(t)


# ---------------------------------------------------------------------------
# Registry (kwargs mirror /root/reference/minigrid/__init__.py)
# ---------------------------------------------------------------------------

_twin("MiniGrid-DistShift1-v0", gen_distshift, strip2_row=2)
_twin("MiniGrid-DistShift2-v0", gen_distshift, strip2_row=5)
for _s in (5, 6, 7):
    _twin(f"MiniGrid-LavaGapS{_s}-v0", gen_lavagap, size=_s)
_twin("MiniGrid-Fetch-5x5-N2-v0", gen_fetch, size=5, num_objs=2)
_twin("MiniGrid-Fetch-6x6-N2-v0", gen_fetch, size=6, num_objs=2)
_twin("MiniGrid-Fetch-8x8-N3-v0", gen_fetch, size=8, num_objs=3)
for _s in (5, 6, 8):
    _twin(f"MiniGrid-GoToDoor-{_s}x{_s}-v0", gen_gotodoor, size=_s)
for _s in (6, 8):
    _twin(f"MiniGrid-GoToObject-{_s}x{_s}-N2-v0", gen_gotoobject, size=_s, num_objs=2)
_twin("MiniGrid-PutNear-6x6-N2-v0", gen_putnear, size=6, num_objs=2)
_twin("MiniGrid-PutNear-8x8-N3-v0", gen_putnear, size=8, num_objs=3)
for _s in (6, 8):
    _twin(f"MiniGrid-RedBlueDoors-{_s}x{_s}-v0", gen_redbluedoors, size=_s)
for _s in (7, 9, 11, 13):
    _twin(f"MiniGrid-MemoryS{_s}-v0", gen_memory, size=_s)
for _s in (13, 17):
    _twin(f"MiniGrid-MemoryS{_s}Random-v0", gen_memory, size=_s, random_length=True)
_twin("MiniGrid-LockedRoom-v0", gen_lockedroom)
_twin("MiniGrid-MultiRoom-N2-S4-v0", gen_multiroom, min_rooms=2, max_rooms=2,
      max_room_size=4)
_twin("MiniGrid-MultiRoom-N4-S5-v0", gen_multiroom, min_rooms=6, max_rooms=6,
      max_room_size=5)
_twin("MiniGrid-MultiRoom-N6-v0", gen_multiroom, min_rooms=6, max_rooms=6)
_twin("MiniGrid-Playground-v0", gen_playground)

for _rs, _nr in ((3, 1), (3, 2), (3, 3), (4, 3), (5, 3), (6, 3)):
    _twin(f"MiniGrid-KeyCorridorS{_rs}R{_nr}-v0", gen_keycorridor,
          room_size=_rs, num_rows=_nr)
_twin("MiniGrid-Unlock-v0", gen_unlock)
_twin("MiniGrid-UnlockPickup-v0", gen_unlockpickup_mg)
_twin("MiniGrid-BlockedUnlockPickup-v0", gen_blockedunlockpickup)

_twin("MiniGrid-ObstructedMaze-1Dl-v0", gen_obstructed_1dl,
      key_in_box=False, blocked=False)
_twin("MiniGrid-ObstructedMaze-1Dlh-v0", gen_obstructed_1dl,
      key_in_box=True, blocked=False)
_twin("MiniGrid-ObstructedMaze-1Dlhb-v0", gen_obstructed_1dl,
      key_in_box=True, blocked=True)
_twin("MiniGrid-ObstructedMaze-2Dl-v0", gen_obstructed_full,
      agent_room=(2, 1), key_in_box=False, blocked=False, num_quarters=1)
_twin("MiniGrid-ObstructedMaze-2Dlh-v0", gen_obstructed_full,
      agent_room=(2, 1), key_in_box=True, blocked=False, num_quarters=1)
_twin("MiniGrid-ObstructedMaze-2Dlhb-v0", gen_obstructed_full,
      agent_room=(2, 1), key_in_box=True, blocked=True, num_quarters=1)
_twin("MiniGrid-ObstructedMaze-1Q-v0", gen_obstructed_full,
      agent_room=(1, 1), key_in_box=True, blocked=True, num_quarters=1)
_twin("MiniGrid-ObstructedMaze-2Q-v0", gen_obstructed_full,
      agent_room=(2, 1), key_in_box=True, blocked=True, num_quarters=2)
_twin("MiniGrid-ObstructedMaze-Full-v0", gen_obstructed_full,
      agent_room=(1, 1), key_in_box=True, blocked=True, num_quarters=4)
_twin("MiniGrid-ObstructedMaze-2Dlhb-v1", gen_obstructed_full_v1,
      agent_room=(2, 1), key_in_box=True, blocked=True, num_quarters=1)
_twin("MiniGrid-ObstructedMaze-1Q-v1", gen_obstructed_full_v1,
      agent_room=(1, 1), key_in_box=True, blocked=True, num_quarters=1)
_twin("MiniGrid-ObstructedMaze-2Q-v1", gen_obstructed_full_v1,
      agent_room=(2, 1), key_in_box=True, blocked=True, num_quarters=2)
_twin("MiniGrid-ObstructedMaze-Full-v1", gen_obstructed_full_v1,
      agent_room=(1, 1), key_in_box=True, blocked=True, num_quarters=4)
