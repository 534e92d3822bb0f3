#!/bin/bash
# Passthrough entry, mirroring the reference's run.sh contract.
exec python "$(dirname "$0")/main.py" "$@"
