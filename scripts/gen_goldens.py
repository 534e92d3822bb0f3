#!/usr/bin/env python
"""Regenerate golden PPMs for the RMSE tests by rendering the deterministic
procedural fixtures with the *compiled C++ reference binary*.

Usage:
    python scripts/gen_goldens.py [--ref-src /root/reference] [--out tests/golden]
                                  [--only substring]

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
    make_env_hdr,
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


def _env_edits(env_path):
    return [
        ("constexpr bool USE_ENV_MAP = false;",
         "constexpr bool USE_ENV_MAP = true;"),
        ('constexpr char ENV_MAP_PATH[] = "env.hdr";',
         f'constexpr char ENV_MAP_PATH[] = "{env_path}";'),
    ]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref-src", default="/root/reference")
    ap.add_argument("--out", default=os.path.join("tests", "golden"))
    ap.add_argument(
        "--only", default="", help="substring filter on golden names"
    )
    args = ap.parse_args()

    def want(name: str) -> bool:
        return args.only in name

    os.makedirs(args.out, exist_ok=True)
    with tempfile.TemporaryDirectory() as tmp:
        if any(want(f"{n}_{s}spp") for n, _, _, _, s in GOLDENS):
            binary = os.path.join(tmp, "raytracer")
            _build(args.ref_src, binary)
            for name, fixture, w, h, spp in GOLDENS:
                if not want(f"{name}_{spp}spp"):
                    continue
                scene_path = fixture(os.path.join(tmp, name, name + ".gltf"))
                out_path = os.path.join(args.out, f"{name}_{spp}spp.ppm")
                subprocess.check_call(
                    [binary, scene_path, str(w), str(h), str(spp), out_path]
                )
                print("wrote", out_path)

        variants = [
            # Environment-map variant: the reference only honors env maps via
            # compile-time constants (src/config.h:36-38) — rebuild with them
            # set and render the Cornell box under a procedural sky.
            ("cornell_env_64x64_4096spp",
             lambda: _env_edits(make_env_image(os.path.join(tmp, "env.png")))),
            # Radiance-HDR env variant: the reference's default ENV_MAP_PATH
            # is a real .hdr decoded by stb_image (src/config.h:38,
            # src/stb_image.h:1); this golden proves our .hdr codec matches
            # that path through the u8 bottleneck.
            ("cornell_envhdr_64x64_4096spp",
             lambda: _env_edits(make_env_hdr(os.path.join(tmp, "env.hdr")))),
            # ADD_LIGHT_TRIANGLE (src/config.h:41-47, src/scene.h:479-498).
            ("cornell_lt_64x64_4096spp",
             lambda: [("constexpr bool ADD_LIGHT_TRIANGLE = false;",
                       "constexpr bool ADD_LIGHT_TRIANGLE = true;")]),
        ]
        for name, edits_fn in variants:
            if not want(name):
                continue
            v_binary = os.path.join(tmp, "raytracer_" + name)
            _build(args.ref_src, v_binary, config_edits=edits_fn())
            scene_path = make_cornell_gltf(
                os.path.join(tmp, name, name + ".gltf")
            )
            out_path = os.path.join(args.out, f"{name}.ppm")
            subprocess.check_call(
                [v_binary, scene_path, "64", "64", "4096", out_path]
            )
            print("wrote", out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
