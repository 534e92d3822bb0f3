#!/usr/bin/env python
"""Regenerate golden PPMs for the RMSE tests by rendering the deterministic
procedural fixtures with the *compiled C++ reference binary*.

Usage:
    python scripts/gen_goldens.py [--ref-src /root/reference] [--out tests/golden]

The reference is built out-of-tree (single translation unit, g++ -O2) and run
at high spp so golden noise is well below the test renders' noise floor.  The
goldens are committed; this script only needs re-running when a fixture scene
changes.
"""

import argparse
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_pathtracer.utils.testscenes import (  # noqa: E402
    make_cornell_gltf,
    make_textured_cornell_gltf,
)

GOLDENS = [
    # (name, fixture fn, width, height, spp)
    ("cornell_64x64", make_cornell_gltf, 64, 64, 4096),
    ("textured_64x64", make_textured_cornell_gltf, 64, 64, 4096),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-src", default="/root/reference")
    ap.add_argument("--out", default=os.path.join("tests", "golden"))
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    with tempfile.TemporaryDirectory() as tmp:
        binary = os.path.join(tmp, "raytracer")
        subprocess.check_call(
            [
                "g++",
                "-O2",
                "-std=c++20",
                "-o",
                binary,
                os.path.join(args.ref_src, "src", "main.cpp"),
            ]
        )
        for name, fixture, w, h, spp in GOLDENS:
            scene_path = fixture(os.path.join(tmp, name, name + ".gltf"))
            out_path = os.path.join(args.out, f"{name}_{spp}spp.ppm")
            subprocess.check_call([binary, scene_path, str(w), str(h), str(spp), out_path])
            print("wrote", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
