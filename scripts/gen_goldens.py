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
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_pathtracer.utils.testscenes import (  # noqa: E402
    make_cornell_gltf,
    make_env_image,
    make_textured_cornell_gltf,
)

GOLDENS = [
    # (name, fixture fn, width, height, spp)
    ("cornell_64x64", make_cornell_gltf, 64, 64, 4096),
    ("textured_64x64", make_textured_cornell_gltf, 64, 64, 4096),
    # Non-square: exercises the fov_y/aspect derivation (src/scene.h:69-71,
    # :238-254) end to end.
    ("cornell_96x64", make_cornell_gltf, 96, 64, 4096),
    # Low-spp render for the estimator-VARIANCE parity test: the reference's
    # noise level at 16 spp is the yardstick our noise must match.
    ("cornell_64x64", make_cornell_gltf, 64, 64, 16),
]


def _build(ref_src: str, out_binary: str, config_edits=None) -> None:
    """Compile the reference; optionally with an edited config.h (the
    reference's knobs are compile-time constants, src/config.h)."""
    if not config_edits:
        subprocess.check_call(
            ["g++", "-O2", "-std=c++20", "-o", out_binary,
             os.path.join(ref_src, "src", "main.cpp")]
        )
        return
    src_copy = out_binary + "_src"
    shutil.copytree(os.path.join(ref_src, "src"), os.path.join(src_copy, "src"))
    cfg_path = os.path.join(src_copy, "src", "config.h")
    with open(cfg_path) as f:
        cfg = f.read()
    for old, new in config_edits:
        assert old in cfg, old
        cfg = cfg.replace(old, new)
    with open(cfg_path, "w") as f:
        f.write(cfg)
    subprocess.check_call(
        ["g++", "-O2", "-std=c++20", "-o", out_binary,
         os.path.join(src_copy, "src", "main.cpp")]
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-src", default="/root/reference")
    ap.add_argument("--out", default=os.path.join("tests", "golden"))
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    with tempfile.TemporaryDirectory() as tmp:
        binary = os.path.join(tmp, "raytracer")
        _build(args.ref_src, binary)
        for name, fixture, w, h, spp in GOLDENS:
            scene_path = fixture(os.path.join(tmp, name, name + ".gltf"))
            out_path = os.path.join(args.out, f"{name}_{spp}spp.ppm")
            subprocess.check_call([binary, scene_path, str(w), str(h), str(spp), out_path])
            print("wrote", out_path)

        # Environment-map variant: the reference only honors env maps via
        # compile-time constants (src/config.h:36-38), so rebuild with them
        # set and render the Cornell box under a procedural sky.
        env_png = make_env_image(os.path.join(tmp, "env.png"))
        env_binary = os.path.join(tmp, "raytracer_env")
        _build(
            args.ref_src,
            env_binary,
            config_edits=[
                ("constexpr bool USE_ENV_MAP = false;",
                 "constexpr bool USE_ENV_MAP = true;"),
                ('constexpr char ENV_MAP_PATH[] = "env.hdr";',
                 f'constexpr char ENV_MAP_PATH[] = "{env_png}";'),
            ],
        )
        scene_path = make_cornell_gltf(os.path.join(tmp, "envc", "envc.gltf"))
        out_path = os.path.join(args.out, "cornell_env_64x64_4096spp.ppm")
        subprocess.check_call(
            [env_binary, scene_path, "64", "64", "4096", out_path]
        )
        print("wrote", out_path)

        # ADD_LIGHT_TRIANGLE variant (src/config.h:41-47, src/scene.h:479-498).
        lt_binary = os.path.join(tmp, "raytracer_lt")
        _build(
            args.ref_src,
            lt_binary,
            config_edits=[
                ("constexpr bool ADD_LIGHT_TRIANGLE = false;",
                 "constexpr bool ADD_LIGHT_TRIANGLE = true;"),
            ],
        )
        scene_path = make_cornell_gltf(os.path.join(tmp, "ltc", "ltc.gltf"))
        out_path = os.path.join(args.out, "cornell_lt_64x64_4096spp.ppm")
        subprocess.check_call(
            [lt_binary, scene_path, "64", "64", "4096", out_path]
        )
        print("wrote", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
