"""Randomized scene generator for parity fuzzing against the C++ reference.

Generates small but *mean* glTF scenes: random geometry (quads, boxes, strip
ribbons, non-indexed fans), random node transforms (TRS quaternions and raw
matrices), and random materials spanning the whole pbrMetallicRoughness space
including alpha and emissive strength.  Rendering one of these with both
implementations and comparing mean radiance catches loader/estimator
divergences that hand-written fixtures miss.
"""

from __future__ import annotations

import math
import os

import numpy as np

from .testscenes import GltfBuilder, quad


def make_fuzz_gltf(path: str, seed: int, textures: bool = True) -> str:
    from PIL import Image

    rng = np.random.default_rng(seed)
    b = GltfBuilder()

    tex_ids = []
    if textures:
        d = os.path.dirname(path) or "."
        os.makedirs(d, exist_ok=True)
        for t in range(2):
            img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
            name = f"fuzz{seed}_tex{t}.png"
            Image.fromarray(img).save(os.path.join(d, name))
            tex_ids.append(b.add_texture(name))

    def rand_material():
        emissive = None
        strength = None
        if rng.random() < 0.3:
            emissive = rng.uniform(0, 1, 3).tolist()
            if rng.random() < 0.5:
                strength = float(rng.uniform(1, 20))
        alpha = 1.0 if rng.random() < 0.7 else float(rng.uniform(0.2, 1.0))
        base_tex = None
        mr_tex = None
        if tex_ids and rng.random() < 0.5:
            base_tex = int(rng.choice(tex_ids))
        if tex_ids and rng.random() < 0.3:
            mr_tex = int(rng.choice(tex_ids))
        return b.add_material(
            (*rng.uniform(0.05, 0.95, 3).tolist(), alpha),
            metallic=float(rng.choice([0.0, 1.0, rng.uniform(0, 1)])),
            roughness=float(rng.uniform(0.02, 1.0)),
            emissive=emissive,
            emissive_strength=strength,
            base_color_texture=base_tex,
            metallic_roughness_texture=mr_tex,
        )

    def rand_quat():
        q = rng.normal(size=4)
        return (q / np.linalg.norm(q)).tolist()

    def rand_transform():
        r = rng.random()
        if r < 0.35:
            return {}
        if r < 0.75:
            return {
                "translation": rng.uniform(-2, 2, 3).tolist(),
                "rotation": rand_quat(),
                "scale": rng.uniform(0.4, 1.8, 3).tolist(),
            }
        # Raw column-major matrix node (parse_mat4 path, src/scene.h:101-108)
        angle = rng.uniform(0, 2 * math.pi)
        c, s = math.cos(angle), math.sin(angle)
        sc = rng.uniform(0.5, 1.5)
        tx, ty, tz = rng.uniform(-1.5, 1.5, 3)
        m = [
            c * sc, s * sc, 0, 0,
            -s * sc, c * sc, 0, 0,
            0, 0, sc, 0,
            tx, ty, tz, 1,
        ]
        return {"matrix": m}

    # Enclosing room so paths terminate against geometry + an area light.
    room = b.add_material((0.6, 0.6, 0.62, 1))
    ext = 4.0
    for face in [
        quad((-ext, -ext, -ext), (ext, -ext, -ext), (ext, -ext, ext), (-ext, -ext, ext)),
        quad((-ext, ext, -ext), (-ext, ext, ext), (ext, ext, ext), (ext, ext, -ext)),
        quad((-ext, -ext, -ext), (-ext, ext, -ext), (ext, ext, -ext), (ext, -ext, -ext)),
        quad((-ext, -ext, -ext), (-ext, -ext, ext), (-ext, ext, ext), (-ext, ext, -ext)),
        quad((ext, -ext, -ext), (ext, ext, -ext), (ext, ext, ext), (ext, -ext, ext)),
    ]:
        b.add_mesh(*face, material=room)
    light = b.add_material(
        (0, 0, 0, 1), emissive=(1, 1, 1), emissive_strength=float(rng.uniform(10, 40))
    )
    b.add_mesh(
        *quad((-1, 3.98, -1), (1, 3.98, -1), (1, 3.98, 1), (-1, 3.98, 1)),
        material=light,
    )

    n_objects = rng.integers(2, 6)
    for _ in range(n_objects):
        mat = rand_material()
        kind = rng.random()
        if kind < 0.4:  # random quad (with UVs so textures get exercised)
            p = rng.uniform(-2, 2, (4, 3)).astype(np.float32)
            p[2] = p[1] + (p[3] - p[0])  # keep it planar-ish
            idx = np.array([0, 1, 2, 0, 2, 3])
            uv_scale = float(rng.uniform(0.5, 3.0))
            uvs = (
                np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=np.float32)
                * uv_scale
            )
            b.add_mesh(
                p, idx, material=mat, uvs=uvs, node_transform=rand_transform()
            )
        elif kind < 0.7:  # box via 12 tris
            s = rng.uniform(0.2, 0.9, 3)
            verts = []
            for dx in (-1, 1):
                for dy in (-1, 1):
                    for dz in (-1, 1):
                        verts.append([dx * s[0], dy * s[1], dz * s[2]])
            v = np.array(verts, dtype=np.float32)
            faces = [
                (0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
                (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3),
            ]
            idx = []
            for f in faces:
                idx += [f[0], f[1], f[2], f[0], f[2], f[3]]
            b.add_mesh(
                v, np.array(idx), material=mat, node_transform=rand_transform()
            )
        else:  # triangle strip ribbon (mode 5)
            n = int(rng.integers(4, 9))
            p = np.zeros((n, 3), dtype=np.float32)
            p[:, 0] = np.linspace(-1, 1, n)
            p[:, 1] = rng.uniform(-0.5, 0.5, n)
            p[:, 2] = np.where(np.arange(n) % 2 == 0, -0.3, 0.3)
            # Explicit indices: the reference crashes on non-indexed
            # primitives (json null -> optional<size_t> throws before its
            # unit_t branch can trigger, src/scene.h:362-386) — we support
            # them, it does not, so parity scenes must stay indexed.
            b.add_mesh(
                p, np.arange(n), material=mat, node_transform=rand_transform()
            )
            b.meshes[-1]["primitives"][0]["mode"] = 5

    b.add_camera((0, 0.5, 3.5), yfov=float(rng.uniform(0.5, 1.0)))
    return b.write(path)
