#!/usr/bin/env bash
# Round-5 serialized chip queue (VERDICT r4 items 2, 4; NOTES_ROUND5).
# Waits for a running prime_bench (pass its PID as $1) before touching
# the chip — two clients on the tunnel make cold compiles time out.
#
#   1. retuned jitter-augment A/B  (VERDICT item 2a; 2048 samples,
#      jitter=4 — the r4 arms were unlearnable at 512/jitter=8)
#   2. residual-stashing backward A/B at TS-Base B=64 (item 4)
#   3. teacher retrain (checkpoints/ lost with the fresh clone)
#   4. rewarm_on distill tail, COMPRESSED schedule (item 2b):
#      epochs 80->28, unfreeze 40->14, rewarm 8->6 — same recipe,
#      shortened to fit the round clock (~61 s/epoch on the tunnel);
#      the cliff control is r3's evidence_distill_real (241ep, no
#      rewarm, final 0.813 vs best 0.998). metrics.jsonl streams, so
#      a clock-truncated run still shows the post-unfreeze tail.
#   5. serve224 tile probe (item 5) if the clock allows
#   6. package curves into evidence/
#
# Re-runnable: arms skip when their .done marker exists.
set -u
cd "$(dirname "$0")/.."
CP=configs/classification
LOGS=evidence/r5_logs
mkdir -p "$LOGS"

if [ "${1:-}" != "" ]; then
  echo "waiting for prime_bench pid $1 ..."
  while kill -0 "$1" 2>/dev/null; do sleep 10; done
  echo "prime_bench done"
fi

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

# 1. retuned augmentation A/B (short arms first)
run jitter_off main_classification_ode.py \
  -c evidence_augment_jitter -cp "$CP" -o checkpoint_dir=checkpoints
run jitter_on main_classification_ode.py \
  -c evidence_augment_jitter -cp "$CP" -o data.dataset.augment=true \
  -o setup.wandb.name=evidence_augment_jitter_on \
  -o checkpoint_dir=checkpoints
python scripts/package_evidence.py \
  evidence_augment_jitter_off evidence_augment_jitter_on || true

# 2. residual-stashing backward A/B (VERDICT item 4: one measured
#    number either way at one shape)
run bwd_stash_ab -m benchmarks.bwd_stash_ab --batch 64 --rounds 5

# 3. teacher (31 epochs ViT-B head-only on the synthetic split)
if [ -d checkpoints/evidence_teacher ]; then
  echo "[skip] teacher (checkpoint exists)"
else
  run evidence_teacher main_classification.py -c evidence_teacher -cp "$CP"
fi

# 4. the headline arm: compressed distill tail, head-LR re-warmup ON.
run rewarm_on main_classification_ode_distillation.py \
  -c evidence_distill_rewarm -cp "$CP" \
  -o setup.dict.epochs=28 -o setup.dict.curriculum_epoch=14 \
  -o setup.dict.head_rewarm_epochs=6 \
  -o setup.dict.cache_teacher=true -o checkpoint_dir=checkpoints \
  -o finetunne.recover_training=true

python scripts/package_evidence.py evidence_rewarm_on || true

# 5. serve224 tile probe (VERDICT item 5) — last, clock permitting
run serve224_tile_probe -m benchmarks.serve224_tile_probe

echo "ROUND5 QUEUE COMPLETE"
