"""Docs/GIF generator smoke tests (reference analog:
docs/_scripts/gen_env_docs.py + gen_gifs.py)."""

from __future__ import annotations

import glob
import os

import pytest

from minigrid_dynamicprogramming_tpu.docs_gen import gen_env_docs, gen_gifs
from minigrid_dynamicprogramming_tpu.registry import family


def test_family_slugs():
    assert family("MiniGrid-DoorKey-8x8-v0") == "doorkey"
    assert family("MiniGrid-DoorKey-16x16-v0") == "doorkey"
    assert family("BabyAI-GoToDoor-v0") != "misc"


def test_gen_env_docs(tmp_path):
    # a representative subset by default (one generate-compile per page is
    # the cost driver); the slow tier sweeps every family
    pages = gen_env_docs(
        str(tmp_path),
        ids=[
            "MiniGrid-DoorKey-8x8-v0",
            "MiniGrid-Dynamic-Obstacles-8x8-v0",
            "BabyAI-GoToRedBallGrey-v0",
        ],
    )
    assert len(pages) == 3
    assert glob.glob(str(tmp_path / "environments" / "minigrid" / "*.md"))
    assert glob.glob(str(tmp_path / "environments" / "babyai" / "*.md"))
    dk = tmp_path / "environments" / "minigrid" / "doorkey.md"
    text = dk.read_text()
    assert 'make("MiniGrid-DoorKey' in text
    assert "MiniGrid-DoorKey-16x16-v0" in text  # sibling list
    assert "Example mission:" in text


@pytest.mark.slow
def test_gen_env_docs_all_families(tmp_path):
    pages = gen_env_docs(str(tmp_path))
    # one page per family, split into minigrid/ and babyai/ groups
    assert len(pages) >= 40


def test_gen_gifs(tmp_path):
    from PIL import Image

    written = gen_gifs(
        str(tmp_path), length=6, tile_size=8, ids=["MiniGrid-Empty-5x5-v0"]
    )
    assert len(written) == 1
    with Image.open(written[0]) as im:
        # PIL merges identical consecutive frames (no-op actions), so the
        # frame count is <= length but the gif must still animate.
        assert 2 <= im.n_frames <= 6
        assert im.size == (5 * 8, 5 * 8)
