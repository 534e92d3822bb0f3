"""Tone mapping + PPM tests (reference: src/image.h)."""

import io

import numpy as np
import jax.numpy as jnp

from tpu_pathtracer.utils.image import (
    aces_tonemap,
    quantize_u8,
    read_ppm,
    tone_map,
    write_ppm,
)


def _aces_ref(x):
    # Trusted float64 reimplementation of src/image.h:51-59.
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return (x * (a * x + b)) / (x * (c * x + d) + e)


def test_aces_matches_formula():
    x = np.linspace(0.0, 10.0, 257, dtype=np.float64)
    got = np.asarray(aces_tonemap(jnp.asarray(x, jnp.float32)), dtype=np.float64)
    np.testing.assert_allclose(got, _aces_ref(x), rtol=2e-5)


def test_tonemap_gamma():
    x = np.array([0.0, 0.18, 1.0, 4.0], dtype=np.float64)
    want = _aces_ref(x) ** (1 / 2.2)
    got = np.asarray(tone_map(jnp.asarray(x, jnp.float32)), dtype=np.float64)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_quantize_clamps_and_rounds():
    # Values engineered so tone_map*255 lands near .5 boundaries and > 255.
    hdr = jnp.asarray([0.0, 1e-6, 0.5, 1.0, 1e6], jnp.float32)
    q = np.asarray(quantize_u8(hdr))
    assert q.dtype == np.uint8
    assert q[0] == 0
    assert q[-1] == 255  # clamp of >1 tonemapped output * 255
    # Monotone
    assert np.all(np.diff(q.astype(int)) >= 0)


def test_ppm_roundtrip():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    buf = io.BytesIO()
    write_ppm(buf, img)
    raw = buf.getvalue()
    assert raw.startswith(b"P6\n3 2\n255\n")
    buf.seek(0)
    back = read_ppm(buf)
    np.testing.assert_array_equal(back, img)
