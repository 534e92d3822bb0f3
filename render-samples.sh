#!/bin/bash
# Batch regression sweep, equivalent to the reference's render-samples.sh
# (which times every sample_data/gltf/*.gltf at 1000x1000 @100spp and prints
# colored ok/fail).  Course glTF files are supplied out-of-band; this sweep
# also covers the homebrew scenes the reference ships but cannot render.
cd "$(dirname "$0")"
W=${W:-1000}; H=${H:-1000}; SPP=${SPP:-100}
shopt -s nullglob
scenes=(sample_data/gltf/*.gltf /root/reference/sample_data/*.txt /root/reference/sample_data/homebrew_primitives/*.txt)
for f in "${scenes[@]}"; do
  name=$(basename "$f")
  if time ./run.sh "$f" "$W" "$H" "$SPP" "out/samples/${name%.*}.ppm"; then
    echo -e "\e[0;32m$name ok\e[0m"
  else
    echo -e "\e[0;31m$name failed\e[0m"
  fi
done
