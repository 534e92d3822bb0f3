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
