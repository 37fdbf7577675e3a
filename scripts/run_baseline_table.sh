#!/usr/bin/env bash
# Reproduce the reference README baseline table (README.md:47-66 rows /
# BASELINE.md) once the two external assets exist locally — this image
# has zero egress, so the script is the executable form of the runbook:
#
#   1. CIFAR data      -> data/cifar/cifar-10-batches-py/ and
#                         data/cifar/cifar-100-python/   (the standard
#                         python-pickle archives; data/cifar.py reads
#                         them natively)
#   2. DINO ViT-B/16   -> a torch .pt/.bin state_dict, an HF
#                         save_pretrained dir, or a cached
#                         facebook/dino-vitb16 (teacher/convert.py
#                         handles all three)
#
# Usage:  scripts/run_baseline_table.sh <dino_ckpt_path> [rows...]
#   rows: any of  teacher10 teacher100 free10 free100
#                 tsbase10 tsbase100 tssmall10 tssmall100   (default all)
#
# Each row = one training run with the exact reference config + the
# dataset/teacher overrides below; checkpoints land in checkpoints/, the
# val acc@1/@3/@5 trail in runs/<name>/metrics.jsonl. Expected numbers:
# BASELINE.md accuracy table (TS-Base CIFAR-100 north star: acc@1 0.716+).
set -euo pipefail
cd "$(dirname "$0")/.."

DINO="${1:?usage: run_baseline_table.sh <dino_ckpt_path> [rows...]}"
shift || true
ROWS=("$@")
[ ${#ROWS[@]} -eq 0 ] && ROWS=(teacher10 teacher100 free10 free100
                               tsbase10 tsbase100 tssmall10 tssmall100)

[ -e "data/cifar" ] || { echo "ERROR: data/cifar missing (see header)"; exit 1; }
[ -e "$DINO" ] || { echo "ERROR: DINO checkpoint '$DINO' missing"; exit 1; }

CP="configs/classification"

# TS-Small student (README.md:63-64, 3.8M params). The reference ships
# no small config; the param count pins it: embed stays 768 (grafting
# requires it) and the MLP halves — patch embed 0.59M + pos 0.15M +
# head 0.08M + qkv 1.77M + out-proj 0.59M + mlp(0.5x: 2*768*384) 0.59M
# = 3.77M ~= 3.8M.
SMALL_OVR=(-o modeling.student.inputs.mlp_ratio=0.5
           -o modeling.student.checkpoint_name=ts_small)

run() { echo "=== $* ==="; python "$@"; }

for row in "${ROWS[@]}"; do
  case "$row" in
    # --- teacher head-training rows (README.md:53-54) ------------------
    teacher10)
      run main_classification.py -c experiment_vit -cp "$CP" \
        -o data.dataset.name=cifar10 -o setup.dict.classifier_only=True \
        -o modeling.checkpoint_name=Vit_CIFAR10_DINO \
        -o modeling.base="$DINO" ;;
    teacher100)
      run main_classification.py -c experiment_vit -cp "$CP" \
        -o data.dataset.name=cifar100 -o setup.dict.classifier_only=True \
        -o modeling.checkpoint_name=Vit_CIFAR100_DINO \
        -o modeling.base="$DINO" ;;
    # --- free-training rows (README.md:57-58) --------------------------
    free10)
      run main_classification_ode.py -c experiment_vit_edo -cp "$CP" \
        -o data.dataset.name=cifar10 \
        -o modeling.inputs.num_classes=10 \
        -o modeling.checkpoint_name=Vit_ODE_CIFAR10_free ;;
    free100)
      run main_classification_ode.py -c experiment_vit_edo -cp "$CP" ;;
    # --- TS-Base rows (README.md:60-61; the north stars) ---------------
    tsbase10)
      run main_classification_ode_distillation.py \
        -c experiment_classification_edo_distillation -cp "$CP" \
        -o setup.dict.cache_teacher=true \
        -o data.dataset.name=cifar10 \
        -o modeling.student.inputs.num_classes=10 \
        -o modeling.teacher.checkpoint_path=checkpoints/Vit_CIFAR10_DINO \
        -o modeling.student.checkpoint_name=ts_base_cifar10 ;;
    tsbase100)
      run main_classification_ode_distillation.py \
        -c experiment_classification_edo_distillation -cp "$CP" \
        -o setup.dict.cache_teacher=true \
        -o modeling.teacher.checkpoint_path=checkpoints/Vit_CIFAR100_DINO ;;
    # --- TS-Small rows (README.md:63-64) -------------------------------
    tssmall10)
      run main_classification_ode_distillation.py \
        -c experiment_classification_edo_distillation -cp "$CP" \
        -o setup.dict.cache_teacher=true \
        -o data.dataset.name=cifar10 \
        -o modeling.student.inputs.num_classes=10 \
        -o modeling.teacher.checkpoint_path=checkpoints/Vit_CIFAR10_DINO \
        "${SMALL_OVR[@]}" ;;
    tssmall100)
      run main_classification_ode_distillation.py \
        -c experiment_classification_edo_distillation -cp "$CP" \
        -o setup.dict.cache_teacher=true \
        -o modeling.teacher.checkpoint_path=checkpoints/Vit_CIFAR100_DINO \
        "${SMALL_OVR[@]}" ;;
    *) echo "unknown row: $row"; exit 1 ;;
  esac
done
echo "All requested rows complete. Val metrics: runs/*/metrics.jsonl"
