#!/usr/bin/env bash
# ORCA ablation matrix (reference scripts/run_ablation_study.sh pattern):
# run the same base config with component toggles, one exp dir each.
set -euo pipefail

CONFIG=${CONFIG:-configs/desta25_qwen3-0.6b_ORCAHybrid.yaml}
BASE=${BASE:-exp/ablation}
EXTRA=("$@")

declare -A ABLATIONS=(
  [exp0_baseline]=""
  [exp1_no_local]="model.orca.local_enabled=false"
  [exp2_no_deep_injection]="model.orca.deep_injection_enabled=false"
  [exp3_no_aux_losses]="model.orca.ortho_diversity_weight=0 model.orca.ortho_weight_qformer_local=0 model.orca.align_weight_local=0"
  [exp4_all_layers]="model.orca.use_all_layers=true"
  [exp5_global_cross_attn]="model.orca.global_cross_attn=true"
)

for name in "${!ABLATIONS[@]}"; do
  echo "=== ablation $name ==="
  EXP_DIR="$BASE/$name"
  mkdir -p "$EXP_DIR"
  RESUME_ARG=""
  [ -e "$EXP_DIR/checkpoint-latest" ] && RESUME_ARG="resume_from_checkpoint=$EXP_DIR"
  # shellcheck disable=SC2086
  python -m desta25_audio_tpu.cli.train --config "$CONFIG" \
    "exp_dir=$EXP_DIR" $RESUME_ARG ${ABLATIONS[$name]} "${EXTRA[@]}"
done
