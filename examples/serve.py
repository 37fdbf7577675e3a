"""Serving demo/benchmark over odevit_tpu.serve.ServingEngine.

Default mode fires concurrent random requests through the engine and
prints latency/throughput stats (a serving benchmark on TPU). With
``--http PORT`` it also exposes a local JSON endpoint:

    POST /predict   {"images": <[b,H,W,3] uint8 nested list>}
                ->  {"logits": [[...], ...]}

Usage:
    python examples/serve.py -c evidence_free_cifar -cp configs/classification
    python examples/serve.py -c ... --http 8000
"""

import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", dest="config", required=True)
    ap.add_argument("-cp", dest="config_dir", default="configs/classification")
    ap.add_argument("-o", dest="overrides", action="append", default=[])
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--http", type=int, default=0, metavar="PORT")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from odevit_tpu.cli import common
    from odevit_tpu.ckpt.checkpoint import CheckpointManager
    from odevit_tpu.data.pipeline import make_preprocess
    from odevit_tpu.serve.engine import ServingEngine
    from odevit_tpu.utils.init_utils import init_on_cpu

    cfg = common.load_config(
        argparse.Namespace(config_file=args.config,
                           config_path=args.config_dir,
                           override=args.overrides))
    num_classes = int(cfg.data.dataset.get("num_classes", 100))
    model = common.build_student(
        dict(cfg.modeling.inputs, num_classes=num_classes),
        str(cfg.modeling.get("type", "vit")))
    img = model.img_size
    sample = jnp.zeros((2, img, img, 3), jnp.float32)
    params = init_on_cpu(model, jax.random.PRNGKey(0), sample)["params"]

    ckpt = CheckpointManager(
        cfg.get("checkpoint_dir", "checkpoints"),
        str(cfg.modeling.get("checkpoint_name", "model")))
    if ckpt.exists():
        params = ckpt.restore_params(params)
        print("[serve] restored checkpoint params from", ckpt.dir)
    else:
        print("[serve] WARNING: no checkpoint found - random weights")

    pre = make_preprocess(None, dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    engine = ServingEngine(model, params, preprocess=pre,
                           batch_buckets=(1, 8, 32, 128))
    print(f"[serve] engine up ({time.perf_counter() - t0:.1f}s warmup, "
          f"buckets {engine.buckets})")

    # ---------------- self-benchmark ----------------
    rng = np.random.default_rng(0)
    reqs = [rng.integers(0, 256, (int(rng.integers(1, 9)), img, img, 3),
                         dtype=np.uint8) for _ in range(args.requests)]
    futs = [None] * len(reqs)

    def worker(lo, hi):
        for i in range(lo, hi):
            futs[i] = engine.submit(reqs[i])

    per = -(-len(reqs) // args.threads)
    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker,
                                args=(t * per, min((t + 1) * per, len(reqs))))
               for t in range(args.threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for f in futs:
        f.result(timeout=600)
    wall = time.perf_counter() - t0
    s = engine.stats()
    s["wall_s"] = round(wall, 3)
    s["images_per_sec"] = round(s["images"] / wall, 1)
    print(json.dumps({k: round(v, 3) if isinstance(v, float) else v
                      for k, v in s.items()}))

    # ---------------- optional HTTP endpoint ----------------
    if args.http:
        from http.server import BaseHTTPRequestHandler, HTTPServer

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                if self.path != "/predict":
                    self.send_error(404)
                    return
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n))
                images = np.asarray(body["images"], np.uint8)
                logits = engine.submit(images).result(timeout=60)
                out = json.dumps({"logits": logits.tolist()}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)

            def log_message(self, *a):
                pass

        print(f"[serve] http on :{args.http} (POST /predict)")
        HTTPServer(("127.0.0.1", args.http), Handler).serve_forever()
    engine.close()


if __name__ == "__main__":
    main()
