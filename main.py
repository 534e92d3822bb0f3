#!/usr/bin/env python
"""Entry point with the reference binary's argv contract (src/main.cpp:16-49):

    python main.py <scene.{gltf,txt}> <width> <height> <samples> <out.ppm>
"""
import sys

from tpu_pathtracer.cli import main

if __name__ == "__main__":
    sys.exit(main())
