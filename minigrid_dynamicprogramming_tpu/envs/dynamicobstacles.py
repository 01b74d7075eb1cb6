"""DynamicObstacles (reference /root/reference/minigrid/envs/dynamicobstacles.py:13-167).

Blue balls random-walk one 3x3 neighborhood per step *before* the agent acts;
walking forward into any non-goal obstacle (including walls) terminates with
reward -1.  The action space is restricted to {left, right, forward}; larger
actions are remapped to ``left`` (dynamicobstacles.py:137-138).

Obstacle coordinates live in ``aux`` slots ``[2i, 2i+1]``; aux slot 22 carries
the pre-move "front not clear" flag from pre_step to post_step.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from minigrid_dynamicprogramming_tpu.core.constants import (
    COLOR_BLUE,
    COLOR_GREEN,
    OBJ_BALL,
    OBJ_EMPTY,
    OBJ_GOAL,
)
from minigrid_dynamicprogramming_tpu.core.env import Environment
from minigrid_dynamicprogramming_tpu.core.state import EnvParams, EnvState, new_state
from minigrid_dynamicprogramming_tpu.ops import agnostic as AG
from minigrid_dynamicprogramming_tpu.ops import grid as G

MISSION = "get to the green goal square"
NOT_CLEAR_SLOT = 22


def make_dynamicobstacles(
    env_id: str,
    size: int = 8,
    agent_start_pos: Optional[Tuple[int, int]] = (1, 1),
    agent_start_dir: int = 0,
    n_obstacles: int = 4,
) -> Environment:
    # Obstacle-count cap (dynamicobstacles.py:61-64).
    if n_obstacles <= size / 2 + 1:
        n_obs = int(n_obstacles)
    else:
        n_obs = int(size / 2)

    params = EnvParams(
        width=size,
        height=size,
        max_steps=4 * size * size,
        see_through_walls=True,
    )

    def generate(key: jax.Array, p: EnvParams):
        k_agent, k_state, *k_obs = jax.random.split(key, 2 + n_obs)
        state = new_state(p.height, p.width, rng=k_state)
        state = G.wall_rect(state, 0, 0, p.width, p.height)
        state = G.put_obj(state, p.width - 2, p.height - 2, OBJ_GOAL, COLOR_GREEN)
        if agent_start_pos is not None:
            state = state.replace(
                agent_pos=jnp.asarray(agent_start_pos, dtype=jnp.int32),
                agent_dir=jnp.asarray(agent_start_dir, dtype=jnp.int32),
            )
        else:
            state, _ = G.place_agent(k_agent, state)
        aux = state.aux
        for i in range(n_obs):
            state, (x, y), ok = G.place_obj(
                k_obs[i], state, OBJ_BALL, COLOR_BLUE
            )
            aux = aux.at[2 * i].set(x).at[2 * i + 1].set(y)
        return state.replace(aux=aux)

    def action_map(p: EnvParams, action):
        return jnp.where(action >= 3, 0, action)

    def pre_step(p: EnvParams, key: jax.Array, state: EnvState, action):
        # Layout-polymorphic (runs vmapped on EnvState and natively on the
        # lane-major LaneState; AG draws are vmap-invariant so both layouts
        # see identical random moves under the same per-env keys).
        # "Front not clear" is evaluated against the PRE-move grid
        # (dynamicobstacles.py:139-141).
        dx, dy = AG.dir_vec(state.agent_dir)
        ax, ay = AG.agent_xy(state)
        fx = jnp.clip(ax + dx, 0, p.width - 1)
        fy = jnp.clip(ay + dy, 0, p.height - 1)
        fo = AG.read_cell(p, state, "grid_obj", fx, fy)
        not_clear = (fo != OBJ_EMPTY) & (fo != OBJ_GOAL)
        state = state.replace(
            aux=state.aux.at[NOT_CLEAR_SLOT].set(not_clear.astype(jnp.int32))
        )

        # Move each obstacle into its 3x3 neighborhood, sequentially — each
        # placement sees the previous moves (dynamicobstacles.py:143-156); a
        # fully-blocked neighborhood leaves the ball in place.
        keys = AG.split_key(key, n_obs)
        for i in range(n_obs):
            ox = state.aux[2 * i]
            oy = state.aux[2 * i + 1]
            valid = AG.free_cell_mask(p, state) & AG.rect_mask(
                p, state, (ox - 1, oy - 1), (3, 3)
            )
            x, y, ok = AG.sample_mask_pos(p, keys[i], state, valid)
            moved = AG.put_obj(p, state, x, y, OBJ_BALL, COLOR_BLUE)
            moved = AG.clear_cell(p, moved, ox, oy)
            moved = moved.replace(
                aux=moved.aux.at[2 * i].set(x).at[2 * i + 1].set(y)
            )
            state = AG.select_state(ok, moved, state)
        return state

    def post_step(p, key, prev, state, action, reward, terminated):
        # Collision on forward into a pre-move-occupied cell
        # (dynamicobstacles.py:161-165).
        # The flag was written by pre_step and carried through base_step.
        collided = (action == 2) & (state.aux[NOT_CLEAR_SLOT] != 0)
        reward = jnp.where(collided, -1.0, reward)
        terminated = terminated | collided
        return state, reward, terminated

    return Environment(
        env_id,
        params,
        generate,
        pre_step=pre_step,
        post_step=post_step,
        pre_step_lanes=pre_step,  # layout-polymorphic via AG helpers
        post_step_lanes=post_step,  # elementwise over per-env scalars
        action_map=action_map,
        mission_text=lambda c: MISSION,
        action_dim=3,
        reward_range=(-1.0, 1.0),
    )
