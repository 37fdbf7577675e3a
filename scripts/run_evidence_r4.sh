#!/usr/bin/env bash
# Round-4 evidence pass — one serialized run over the single TPU tunnel.
# Produces the on-chip artifacts VERDICT r3 items 6 and 7 ask for:
#
#   1. augment A/B on the TRANSLATION-JITTERED synthetic variant
#      (crop/flip is label-preserving there, so the native batcher's
#      augmentation can win — the r3 A/B used position-pinned templates
#      where it provably hurts)
#   2. teacher retrain (checkpoints/ was lost to the VM reset)
#   3. distillation tail with the curriculum unfreeze at epoch 40 and
#      the head-LR re-warmup ON (the fix for the r3 post-unfreeze
#      accuracy cliff: final 0.813 vs best 0.998)
#   4. (time permitting) the rewarm-OFF control arm on the same
#      compressed schedule
#
# Re-runnable: arms are skipped when their .done marker exists.
set -u
cd "$(dirname "$0")/.."
CP=configs/classification
LOGS=evidence/r4_logs
mkdir -p "$LOGS"

run() {
  local name=$1; shift
  if [ -e "$LOGS/$name.done" ]; then
    echo "[skip] $name (done)"; return 0
  fi
  echo "=== $name: python $* ==="
  if python "$@" > "$LOGS/$name.log" 2>&1; then
    echo "[ok] $name"; touch "$LOGS/$name.done"
  else
    echo "[FAIL] $name (tail of $LOGS/$name.log):"
    tail -5 "$LOGS/$name.log"
  fi
}

# 1. augmentation A/B on the jittered variant (short arms first so the
#    round has its curves even if the long distill run is interrupted)
run augment_jitter_off main_classification_ode.py \
  -c evidence_augment_jitter -cp "$CP" -o checkpoint_dir=checkpoints
run augment_jitter_on main_classification_ode.py \
  -c evidence_augment_jitter -cp "$CP" -o data.dataset.augment=true \
  -o setup.wandb.name=evidence_augment_jitter_on \
  -o checkpoint_dir=checkpoints

# 2. teacher (31 epochs ViT-B head-only on the synthetic split)
if [ -d checkpoints/evidence_teacher ]; then
  echo "[skip] teacher (checkpoint exists)"
else
  run evidence_teacher main_classification.py -c evidence_teacher -cp "$CP"
fi

# 3. the headline arm: compressed distill schedule (80 epochs, unfreeze
#    at 40) with the head-LR re-warmup ON. Resumable via recover_training.
run rewarm_on main_classification_ode_distillation.py \
  -c evidence_distill_rewarm -cp "$CP" \
  -o setup.dict.cache_teacher=true -o checkpoint_dir=checkpoints \
  -o finetunne.recover_training=true

# 4. control arm: same schedule, re-warmup OFF (reproduces the cliff)
run rewarm_off main_classification_ode_distillation.py \
  -c evidence_distill_rewarm -cp "$CP" \
  -o setup.dict.head_rewarm_epochs=0 \
  -o setup.wandb.name=evidence_rewarm_off \
  -o modeling.student.checkpoint_name=evidence_distill_rewarm_off \
  -o setup.dict.cache_teacher=true -o checkpoint_dir=checkpoints \
  -o finetunne.recover_training=true

# package fresh curves into evidence/
python scripts/package_evidence.py \
  evidence_augment_jitter_off evidence_augment_jitter_on \
  evidence_rewarm_on evidence_rewarm_off || true
