"""Host-side debugging helpers: ASCII grid printer and state digest.

Counterparts of ``MiniGridEnv.pprint_grid`` (string rendering,
/root/reference/minigrid/minigrid_env.py:175-229) and ``MiniGridEnv.hash``
(sha256 state digest, minigrid_env.py:159-169), re-expressed over the SoA
:class:`EnvState`.  The digest hashes the *wire encoding* (the three grid
planes in the reference's ``Grid.encode`` layout) plus the agent pose, so it
can be compared across frameworks and used for checkpoint-integrity and
parity assertions.
"""

from __future__ import annotations

import hashlib

import numpy as np

from minigrid_dynamicprogramming_tpu.core.constants import (
    IDX_TO_COLOR,
    OBJ_DOOR,
    OBJ_EMPTY,
    OBJECT_TO_IDX,
    STATE_LOCKED,
    STATE_OPEN,
)

_OBJ_CHAR = {
    OBJECT_TO_IDX["wall"]: "W",
    OBJECT_TO_IDX["floor"]: "F",
    OBJECT_TO_IDX["door"]: "D",
    OBJECT_TO_IDX["key"]: "K",
    OBJECT_TO_IDX["ball"]: "A",
    OBJECT_TO_IDX["box"]: "B",
    OBJECT_TO_IDX["goal"]: "G",
    OBJECT_TO_IDX["lava"]: "V",
}
_DIR_CHAR = {0: ">", 1: "V", 2: "<", 3: "^"}


def pprint_state(state) -> str:
    """Two-characters-per-cell ASCII view (object char + color initial),
    agent drawn as a doubled direction arrow — same format as the
    reference's ``pprint_grid``."""
    obj = np.asarray(state.grid_obj)
    color = np.asarray(state.grid_color)
    st = np.asarray(state.grid_state)
    ax, ay = int(state.agent_pos[0]), int(state.agent_pos[1])
    adir = int(state.agent_dir)

    rows = []
    h, w = obj.shape
    for j in range(h):
        line = []
        for i in range(w):
            if (i, j) == (ax, ay):
                line.append(2 * _DIR_CHAR[adir])
                continue
            t = int(obj[j, i])
            if t == OBJ_EMPTY:
                line.append("  ")
                continue
            c = IDX_TO_COLOR[int(color[j, i])][0].upper()
            if t == OBJ_DOOR:
                s = int(st[j, i])
                if s == STATE_OPEN:
                    line.append("__")
                elif s == STATE_LOCKED:
                    line.append("L" + c)
                else:
                    line.append("D" + c)
                continue
            line.append(_OBJ_CHAR.get(t, "?") + c)
        rows.append("".join(line))
    return "\n".join(rows)


def encode_grid(state) -> np.ndarray:
    """(W, H, 3) uint8 wire encoding of the grid — the reference's
    ``Grid.encode`` with an all-visible mask (grid.py:244-268)."""
    planes = np.stack(
        [
            np.asarray(state.grid_obj),
            np.asarray(state.grid_color),
            np.asarray(state.grid_state),
        ],
        axis=-1,
    )  # [y, x, 3]
    return np.transpose(planes, (1, 0, 2))  # reference layout is [x, y, 3]


def state_hash(state, size: int = 16) -> str:
    """Digest identifying the world state — grid encoding + agent pose,
    hashed exactly like ``MiniGridEnv.hash`` so a reference env and a
    framework state in the same configuration produce the SAME digest."""
    h = hashlib.sha256()
    agent_pos = (int(state.agent_pos[0]), int(state.agent_pos[1]))
    to_encode = [
        encode_grid(state).tolist(),
        agent_pos,
        int(state.agent_dir),
    ]
    for item in to_encode:
        h.update(str(item).encode("utf8"))
    return h.hexdigest()[:size]
