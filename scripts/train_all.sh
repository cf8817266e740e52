#!/usr/bin/env bash
# Full-size experiments (reference scripts/train_all.sh).
set -euo pipefail
cd "$(dirname "$0")/.."

for exp in chest_base_vae path_beta_vae multi_modal_cvae; do
    echo "=== experiment: $exp ==="
    python -m medvae_tpu.cli.train "experiment=$exp" "$@"
done
