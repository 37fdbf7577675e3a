#!/usr/bin/env bash
# Round-3 accuracy-transfer evidence suite — one serialized pass over the
# single TPU tunnel. Produces every on-chip artifact VERDICT r2 asked for:
#
#   1. bench refresh        (serving fusions landed since BENCH_r02)
#   2. teacher training     -> checkpoints/evidence_teacher  (val >= 0.95)
#   3. TS distillation      vs that trained teacher (cache_teacher on):
#                           student val acc must climb toward teacher's
#   4. free baseline        same student arch / data / epochs, no teacher
#   5. augment A/B          512-image split; native pad-4 crop + flip arm
#                           should beat the off arm at matched epochs
#   6. TS-Base step profile (subtractive decomposition)
#
# Checkpoints + metrics stay inside the repo (checkpoints/, runs/ — both
# gitignored but on persistent disk; a VM restart no longer loses them).
# Logs land in evidence/r3_logs/. Arms are skipped if their metrics file
# already exists, so the script is re-runnable after an interruption.
set -u
cd "$(dirname "$0")/.."
CP=configs/classification
LOGS=evidence/r3_logs
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

# 1. TS-Base distillation-step decomposition (early: its output drives
#    the round's backward-kernel perf work while the long runs proceed)
if [ ! -s "$LOGS/distill_profile.log" ] \
   || grep -q Traceback "$LOGS/distill_profile.log"; then
  echo "=== distill_profile ==="
  python benchmarks/distill_profile.py > "$LOGS/distill_profile.log" 2>&1 \
    && echo "[ok] distill_profile" || echo "[FAIL] distill_profile"
fi

# 2. teacher (31 epochs ViT-B on the synthetic split)
if [ -d checkpoints/evidence_teacher ]; then
  echo "[skip] teacher (checkpoint exists)"
else
  run evidence_teacher main_classification.py -c evidence_teacher -cp "$CP"
fi

# 3. the headline: TS-Base trajectory distillation vs the trained teacher.
#    recover_training=true makes the arm resumable: it restores the best
#    checkpoint and continues at the implied epoch after an interruption
#    (no-op on a fresh start — the checkpoint doesn't exist yet).
run evidence_distill_real main_classification_ode_distillation.py \
  -c evidence_distill_real -cp "$CP" \
  -o setup.dict.cache_teacher=true -o checkpoint_dir=checkpoints \
  -o finetunne.recover_training=true

# 4. matched-epoch free-training control arm (resumable, same mechanism)
run evidence_free_base main_classification_ode.py \
  -c evidence_free_base -cp "$CP" -o checkpoint_dir=checkpoints \
  -o infer_from_checkpoint=true

# 5. augmentation A/B on the 512-image split
run evidence_augment_off main_classification_ode.py \
  -c evidence_augment -cp "$CP" -o checkpoint_dir=checkpoints
run evidence_augment_on main_classification_ode.py \
  -c evidence_augment -cp "$CP" -o data.dataset.augment=true \
  -o setup.wandb.name=evidence_augment_on -o checkpoint_dir=checkpoints

# 6. bench refresh last, once the chip is otherwise quiet (measures the
#    serving fusions + the full train variant matrix with MFU)
if [ ! -s "$LOGS/bench_final.json" ]; then
  echo "=== bench ==="
  python bench.py > "$LOGS/bench_final.json" 2> "$LOGS/bench_final.err" \
    && echo "[ok] bench" || { echo "[FAIL] bench"; tail -5 "$LOGS/bench_final.err"; }
fi

echo "EVIDENCE SUITE COMPLETE"
