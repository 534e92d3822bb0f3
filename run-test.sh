#!/bin/bash
# Smoke render, equivalent to the reference's run-test.sh (which renders
# sample_data/gltf/practice7_1.gltf 400x400 @4000spp).  The course glTF files
# are supplied out-of-band; when absent we render the committed procedural
# Cornell fixture at the same settings.
set -e
cd "$(dirname "$0")"
SCENE=${1:-sample_data/gltf/practice7_1.gltf}
if [ ! -f "$SCENE" ]; then
  python - <<'EOF'
from tpu_pathtracer.utils.testscenes import make_cornell_gltf
make_cornell_gltf("out/fixtures/cornell.gltf")
EOF
  SCENE=out/fixtures/cornell.gltf
fi
./run.sh "$SCENE" 400 400 4000 out/run-test.ppm
