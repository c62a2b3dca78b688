#!/usr/bin/env bash
# Example training launch (reference examples/train/train_example.sh
# equivalent): environment capture + config overrides + auto-resume.
set -euo pipefail

EXP_DIR=${EXP_DIR:-exp/$(date +%Y%m%d_%H%M%S)}
CONFIG=${CONFIG:-configs/desta25_debug.yaml}

mkdir -p "$EXP_DIR"
# run provenance (reference captures git diff / device info / pip list)
git rev-parse HEAD > "$EXP_DIR/git_commit.txt" 2>/dev/null || true
git diff > "$EXP_DIR/git_diff.patch" 2>/dev/null || true
python -c "import jax; print(jax.devices())" > "$EXP_DIR/devices.txt" 2>&1 || true
pip list --format=freeze > "$EXP_DIR/pip_list.txt" 2>/dev/null || true

# auto-resume when a checkpoint exists (sbatch requeue pattern,
# reference ablation_sbatch/exp0_baseline.sbatch:36-44)
RESUME_ARG=""
if [ -e "$EXP_DIR/checkpoint-latest" ]; then
  RESUME_ARG="resume_from_checkpoint=$EXP_DIR"
fi

exec python -m desta25_audio_tpu.cli.train \
  --config "$CONFIG" \
  "exp_dir=$EXP_DIR" \
  $RESUME_ARG \
  "$@"
