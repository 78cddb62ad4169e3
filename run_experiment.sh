#!/bin/bash
# Batch experiment driver (counterpart of the reference run_experiment.sh):
# runs a set of seeds for one config back to back.
#   ./run_experiment.sh params_pendulum1D_samples 0 1 2
set -e
PARAM=${1:-params_pendulum1D_samples}
shift || true
SEEDS=${@:-42}
for i in $SEEDS; do
    echo "=== $PARAM seed $i ==="
    python main.py -param "$PARAM" -env 0 -i "$i"
done
