"""Executable wrapper docstring examples, mirroring the reference's CI
doctest run (/root/reference/.github/workflows/build.yml:23-24 runs
``pytest --doctest-modules`` over the package; the wrapper docstrings in
/root/reference/minigrid/wrappers.py are executable specs).

Run here under the test tier's CPU config so the examples stay cheap; CI
additionally runs ``pytest --doctest-modules`` over the wrappers package
directly (.github/workflows/build.yml).
"""

import doctest

import minigrid_dynamicprogramming_tpu.wrappers as wrappers_mod


def test_wrapper_doctests():
    result = doctest.testmod(
        wrappers_mod,
        verbose=False,
        optionflags=doctest.NORMALIZE_WHITESPACE,
    )
    assert result.failed == 0, f"{result.failed} wrapper doctests failed"
    # All 15 wrappers carry at least one executable example.
    assert result.attempted >= 15
