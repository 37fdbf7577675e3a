#!/usr/bin/env python
"""Copy finished training runs into the committed evidence/ tree and
print a curve summary per run (best/final val acc, epochs, throughput).

Usage: python scripts/package_evidence.py <run_name> [<run_name> ...]

Reads runs/<name>/{metrics.jsonl,config.json} (the MetricLogger JSONL
fallback artifacts), writes evidence/<name>/ with both files verbatim,
and prints one summary line per run for the evidence README.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def summarize(name: str) -> dict:
    src = os.path.join(ROOT, "runs", name)
    dst = os.path.join(ROOT, "evidence", name)
    metrics = os.path.join(src, "metrics.jsonl")
    if not os.path.isfile(metrics):
        return {"name": name, "error": "no metrics.jsonl"}
    os.makedirs(dst, exist_ok=True)
    shutil.copy2(metrics, os.path.join(dst, "metrics.jsonl"))
    cfg = os.path.join(src, "config.json")
    if os.path.isfile(cfg):
        shutil.copy2(cfg, os.path.join(dst, "config.json"))

    rows = [json.loads(line) for line in open(metrics)]
    val = [r for r in rows if "val/acc@1" in r]
    train = [r for r in rows if "train/epoch" in r]
    out = {"name": name, "epochs": max((r.get("train/epoch", 0)
                                        for r in train), default=0)}
    if val:
        best = max(val, key=lambda r: r["val/acc@1"])
        out.update(best_val_acc1=round(best["val/acc@1"], 4),
                   best_val_epoch=val.index(best) + 1,
                   final_val_acc1=round(val[-1]["val/acc@1"], 4),
                   final_val_acc5=round(val[-1].get("val/acc@5", 0.0), 4),
                   first_val_acc1=round(val[0]["val/acc@1"], 4))
    ips = [r["train/images_per_sec"] for r in rows
           if "train/images_per_sec" in r]
    if ips:
        out["median_images_per_sec"] = round(sorted(ips)[len(ips) // 2], 1)
    return out


if __name__ == "__main__":
    for name in sys.argv[1:]:
        print(json.dumps(summarize(name)))
