"""Actor-critic networks for Minigrid observations.

The reference ships no model code at all (SURVEY.md §0) — these networks
exist because the framework's north star includes feeding sharded env
batches to a learner (BASELINE.json config 5).  They are TPU-shaped:

* the symbolic (view, view, 3) uint8 image is embedded per-plane
  (object/color/state ids -> learned vectors) via one-hot bf16 matmuls
  (:class:`OneHotEmbed`) — gather-based ``nn.Embed`` lookups measured
  ~2.8 ms each per rollout step at 32k envs (and scatter-add backward in
  the learner), while the one-hot contraction rides the MXU;
* convolutions and matmuls run in bfloat16 (params stay f32) so they tile
  onto the MXU;
* the BabyAI mission is consumed directly as the 48-int instruction code
  vector (core/state.py MISSION_SLOTS) through an embedding-bag — no string
  processing anywhere near the device.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from minigrid_dynamicprogramming_tpu.core.constants import NUM_ACTIONS
from minigrid_dynamicprogramming_tpu.core.state import MISSION_SLOTS


class OneHotEmbed(nn.Module):
    """Embedding lookup as a one-hot matmul.

    ``nn.Embed`` lowers to a row gather (and scatter-add on the backward
    pass) — measured at ~2.8 ms per 1.6M-row lookup inside the PPO rollout
    scan on one chip, 4 such lookups per step.  For the tiny vocabularies
    here (<= 64 ids) a one-hot bf16 matmul rides the MXU instead and its
    backward is another matmul; same parameters, same math.
    """

    vocab: int
    features: int
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal", out_axis=0),
            (self.vocab, self.features),
        )
        oh = jax.nn.one_hot(ids, self.vocab, dtype=self.compute_dtype)
        return oh @ table.astype(self.compute_dtype)


class ObsEncoder(nn.Module):
    """Encode {image, direction, mission} into one feature vector."""

    embed_dim: int = 8
    conv_features: Sequence[int] = (32, 64, 64)
    hidden: int = 256
    mission_vocab: int = 64  # instruction codes are small ints (< 48)
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs) -> jnp.ndarray:
        img = obs["image"].astype(jnp.int32)  # (..., V, V, 3)
        # Per-plane learned embeddings, concatenated channelwise.
        planes = []
        for c, vocab in enumerate((16, 8, 4)):  # obj / color / state ids
            emb = OneHotEmbed(
                vocab, self.embed_dim, compute_dtype=self.compute_dtype,
                name=f"plane_embed_{c}",
            )
            planes.append(emb(jnp.clip(img[..., c], 0, vocab - 1)))
        x = jnp.concatenate(planes, axis=-1)

        for i, feat in enumerate(self.conv_features):
            x = nn.Conv(
                feat, (3, 3), padding="SAME", dtype=self.compute_dtype,
                name=f"conv_{i}",
            )(x)
            x = nn.relu(x)
            if i < len(self.conv_features) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(*x.shape[:-3], -1)  # flatten spatial

        d = OneHotEmbed(
            4, 16, compute_dtype=self.compute_dtype, name="dir_embed"
        )(obs["direction"].astype(jnp.int32))

        # Mission embedding-bag: position-tagged code embeddings, summed.
        codes = obs["mission"].astype(jnp.int32)  # (..., MISSION_SLOTS)
        tok = OneHotEmbed(
            self.mission_vocab, 32, compute_dtype=self.compute_dtype,
            name="code_embed",
        )(jnp.clip(codes, 0, self.mission_vocab - 1))
        pos = self.param(
            "code_pos",
            nn.initializers.normal(0.02),
            (MISSION_SLOTS, 32),
        ).astype(self.compute_dtype)
        m = (tok * pos).sum(axis=-2)

        h = jnp.concatenate([x, d, m], axis=-1)
        h = nn.Dense(self.hidden, dtype=self.compute_dtype, name="trunk")(h)
        return nn.relu(h)


class ActorCritic(nn.Module):
    """Policy + value heads over :class:`ObsEncoder` features."""

    num_actions: int = NUM_ACTIONS
    hidden: int = 256
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = ObsEncoder(hidden=self.hidden, compute_dtype=self.compute_dtype)(obs)
        logits = nn.Dense(
            self.num_actions, dtype=jnp.float32, name="policy_head"
        )(h)
        value = nn.Dense(1, dtype=jnp.float32, name="value_head")(h)
        return logits, value.squeeze(-1)


def init_params(model: ActorCritic, key: jax.Array, env) -> dict:
    """Initialize parameters from one dummy (unbatched) observation."""
    dummy = {
        "image": jnp.zeros(
            (env.params.agent_view_size, env.params.agent_view_size, 3),
            dtype=jnp.uint8,
        ),
        "direction": jnp.zeros((), dtype=jnp.int32),
        "mission": jnp.zeros((MISSION_SLOTS,), dtype=jnp.int32),
    }
    return model.init(key, dummy)
