"""CLI argv parsing parity: ``_strtol`` must match C ``strtol`` semantics
(src/main.cpp:23-25 parses width/height/samples with strtol base 10)."""

import pytest

from tpu_pathtracer.cli import _strtol


@pytest.mark.parametrize(
    "s,expected",
    [
        ("400", 400),
        (" 400", 400),  # strtol skips leading whitespace
        ("\t\n 400", 400),
        ("+12", 12),
        ("-7", -7),
        (" -7px", -7),  # trailing garbage ignored
        ("12ab", 12),
        ("ab", 0),  # no digits -> 0
        ("", 0),
        ("+", 0),
        ("+-3", 0),  # sign not followed by digits
        ("  ", 0),
        ("007", 7),
    ],
)
def test_strtol_parity(s, expected):
    assert _strtol(s) == expected


def test_cli_jitter_env(tmp_path, monkeypatch):
    """TPU_PATHTRACER_JITTER=sobol reaches the render through the 5-arg CLI
    (which has no flag slots): the image differs from the uniform-jitter
    render but converges to the same estimator (close means)."""
    import numpy as np

    from tpu_pathtracer.cli import render_scene_file
    from tpu_pathtracer.utils.testscenes import make_cornell_gltf

    p = make_cornell_gltf(str(tmp_path / "c.gltf"))
    a, _ = render_scene_file(p, 32, 32, 4, progress=False)
    monkeypatch.setenv("TPU_PATHTRACER_JITTER", "sobol")
    b, _ = render_scene_file(p, 32, 32, 4, progress=False)
    assert not np.array_equal(a, b)
    assert np.abs(np.mean(a, axis=(0, 1)) - np.mean(b, axis=(0, 1))).max() < 0.2
