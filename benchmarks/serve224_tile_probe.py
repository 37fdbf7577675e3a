"""serve224 tile-class probe (VERDICT r3 item 4b context).

Question: is the 224px ratio-1 serving forward's ~30% MFU ceiling set by
VMEM (what a raised scoped tier would fix) or by the Mosaic AOT
compile-cost cap (_tile_class_cap pins d>=512 to bb=2)?

Query-dimension tiling would NOT change the MXU M dimension (bb=2 x 208
rows = 416 either way), so the only lever that raises M is a bigger
batch tile. This probe compiles the SERVING-ONLY program (one fused
euler kernel, far smaller than the full train step whose bb=4 compile
died in r3) at bb=4 under the 64MB tier, bounded by a timeout, and
measures it against bb=2 alternating same-window if it compiles.

Usage: timeout 1200 python -m benchmarks.serve224_tile_probe
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from odevit_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from odevit_tpu.data.pipeline import make_preprocess
    from odevit_tpu.models.fast_forward import fast_forward
    from odevit_tpu.models.vit_ode import ViTODE
    from odevit_tpu.utils.init_utils import init_on_cpu
    from odevit_tpu.kernels.vector_field import (BWD_SCOPED_VMEM_KIB_BIG,
                                                 BWD_VMEM_BUDGET_BIG)

    sm = ViTODE(img_size=224, patch_size=16, embed_dim=768, num_heads=12,
                mlp_ratio=1.0, num_classes=100, emulate_depth=12.0,
                time_interval=1.0, num_eval_steps=25, solver="euler",
                register_tokens=10, pos_embed_register_tokens=False,
                remat=False, dtype=jnp.bfloat16)
    pre = make_preprocess(image_size=224, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    img = jax.device_put(rng.integers(0, 256, (64, 224, 224, 3),
                                      dtype=np.uint8))
    params = init_on_cpu(sm, jax.random.PRNGKey(0), pre(img[:2]))["params"]

    from odevit_tpu.kernels import vector_field as VF
    opts = {"xla_tpu_scoped_vmem_limit_kib": BWD_SCOPED_VMEM_KIB_BIG}

    fwds, compile_s = {}, {}
    orig_cap = VF._tile_class_cap
    for bb in (2, 4):
        # lift the tile-class cap for the probe arm only
        VF._tile_class_cap = (orig_cap if bb == 2
                              else (lambda d, dh: 4))
        try:
            fwd = jax.jit(lambda p, im, _bb=bb: fast_forward(
                sm, p, pre(im), block_b=_bb,
                vmem_budget=BWD_VMEM_BUDGET_BIG)["logits"],
                compiler_options=opts)
            t0 = time.perf_counter()
            jax.block_until_ready(fwd(params, img))
            compile_s[bb] = round(time.perf_counter() - t0, 1)
            fwds[bb] = fwd
            print(f"# bb={bb}: compiled+first in {compile_s[bb]}s",
                  flush=True)
        finally:
            VF._tile_class_cap = orig_cap

    times = {bb: [] for bb in fwds}
    for _ in range(8):
        for bb, fwd in fwds.items():          # alternate same-window
            t0 = time.perf_counter()
            jax.block_until_ready(fwd(params, img))
            times[bb].append(time.perf_counter() - t0)

    out = {"compile_s": compile_s}
    for bb, ts in times.items():
        best = min(ts)
        out[f"bb{bb}"] = {"best_ms": round(best * 1e3, 2),
                          "images_per_sec": round(64 / best, 1),
                          "all_ms": [round(t * 1e3, 1) for t in ts]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
