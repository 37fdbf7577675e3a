#!/usr/bin/env python
"""Analysis pipeline: everything the reference's notebooks did, as a CLI.

Replaces attention_visualizations.ipynb (attention maps, thresholded
masses, evolution video, rollout overlays), visus_ViT.ipynb (CLS
trajectory PCA phase portraits, Koopman-inferred dynamics), the stripped
lyapunov.ipynb (per-class Lyapunov-exponent artifacts), and
evaluate_performance_memory.ipynb (FLOPs/params profile vs the teacher).

Usage:
    python examples/run_analysis.py --out /tmp/odevit_analysis \
        [--checkpoint checkpoints/<name>] [--ref-pt path.pt] [--batch 8]

With no checkpoint it analyses a freshly initialized model (useful for
pipeline checks); with one it reproduces the notebook outputs for real.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="analysis_out")
    ap.add_argument("--checkpoint", default="",
                    help="orbax checkpoint dir (ours)")
    ap.add_argument("--ref-pt", default="",
                    help="reference torch .pt checkpoint to import")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--config", default="tiny",
                    choices=["tiny", "base224"])
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import jax
    import jax.numpy as jnp
    from odevit_tpu.models.vit_ode import ViTODE
    from odevit_tpu.utils.init_utils import init_on_cpu
    from odevit_tpu.utils.io import save_lyapunov_records
    from odevit_tpu.analysis import viz
    from odevit_tpu.analysis.rollout import (attention_rollout, cls_heatmap,
                                             export_trajectory)
    from odevit_tpu.analysis.lyapunov import model_lyapunov_records
    from odevit_tpu.analysis.pca import (analyse_pca_stability,
                                         perform_pca_lowrank,
                                         project_onto_subspace)
    from odevit_tpu.analysis.koopman import (fit_koopman, koopman_spectrum,
                                             predict_trajectory)
    from odevit_tpu.analysis.profiling import count_params, flops_estimate

    model = (ViTODE.tiny_cifar(num_classes=10) if args.config == "tiny"
             else ViTODE.base_224())
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(
        0, 256, (args.batch, model.img_size, model.img_size, 3)
    ).astype(np.float32) / 255.0)
    labels = np.asarray(rng.integers(0, model.num_classes, args.batch))

    variables = init_on_cpu(model, jax.random.PRNGKey(0), x)
    if args.ref_pt:
        from odevit_tpu.ckpt.checkpoint import \
            load_reference_vitode_checkpoint
        params = load_reference_vitode_checkpoint(
            args.ref_pt, embed_dim=model.embed_dim,
            l2_attention=model.l2_attention)
        variables = {"params": jax.device_put(params)}
        print(f"[load] imported reference checkpoint {args.ref_pt}")
    elif args.checkpoint:
        import orbax.checkpoint as ocp
        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(os.path.join(args.checkpoint, "state")))
        variables = {"params": restored["params"]}
        print(f"[load] restored {args.checkpoint}")

    # 1. full trajectory export ------------------------------------------
    out = export_trajectory(model, variables, x, jasmin_k=10)
    print(f"[traj] states {out['states'].shape} attn trajectory "
          f"{out['attention_trajectory'].shape}")

    # 2. attention evolution video + rollout overlay ---------------------
    video = viz.attention_video(
        out["attention_trajectory"], os.path.join(args.out, "attention.mp4"),
        image=np.asarray(x[0]), fps=4)
    roll = attention_rollout(out["attention_trajectory"][:, :1])
    grid = model.img_size // model.patch_size
    heat = np.asarray(cls_heatmap(roll, grid))[0]
    frame = viz._render_heat_frame(heat / (heat.max() + 1e-12),
                                   np.asarray(x[0]), 0.5)
    import imageio
    imageio.imwrite(os.path.join(args.out, "rollout_overlay.png"), frame)
    print(f"[viz] {video}, rollout_overlay.png")

    # 3. CLS trajectory phase portraits (PCA) -----------------------------
    cls_traj = out["states"][:, 0, 0, :]                 # [T, D]
    _, _, v3 = perform_pca_lowrank(jnp.asarray(cls_traj), 3)
    proj = np.asarray(project_onto_subspace(jnp.asarray(cls_traj), v3, 3))
    viz.plot_3d_trajectory(proj, title="CLS trajectory (PCA)").savefig(
        os.path.join(args.out, "cls_trajectory_pca.png"))
    flat = out["states"][:, :, 0, :].reshape(-1, model.embed_dim)
    analyse_pca_stability(jnp.asarray(flat), n_components=3,
                          sample_sizes=(8, 16, min(32, flat.shape[0])),
                          plot_dir=args.out)

    # 4. Koopman phase portrait ------------------------------------------
    km = fit_koopman(jnp.asarray(proj))
    mags, angles = map(np.asarray, koopman_spectrum(km))
    pred = np.asarray(predict_trajectory(jnp.asarray(proj[0]), km,
                                         horizon=proj.shape[0] - 1).real)
    viz.plot_merged_3d_trajectories(
        proj, pred, title="Observed vs Koopman rollout").savefig(
        os.path.join(args.out, "koopman_phase_portrait.png"))
    print(f"[koopman] |lambda| in [{mags.min():.3f}, {mags.max():.3f}]")

    # 5. Lyapunov artifacts ----------------------------------------------
    records = model_lyapunov_records(model, variables, x, labels)
    save_lyapunov_records(records,
                          os.path.join(args.out, "lyapunov_results.pkl"))
    lams = [r[4] for recs in records.values() for r in recs]
    print(f"[lyapunov] {len(lams)} records, lambda mean "
          f"{np.mean(lams):.4f}")

    # 6. FLOPs / params profile vs the ViT-B/16 teacher ------------------
    n_params = count_params(variables["params"])
    fwd = lambda p, xx: model.apply({"params": p}, xx)["logits"]
    flops = flops_estimate(fwd, variables["params"], x) / args.batch
    profile = {"model_params": int(n_params),
               "model_gflops_per_image": flops / 1e9,
               "teacher_params": 86_389_248,
               "note": "teacher = ViT-B/16 (85M); reference notebook "
                       "reports EDO~5.7 vs teacher~16.9 (thop units)"}
    with open(os.path.join(args.out, "profile.json"), "w") as f:
        json.dump(profile, f, indent=2)
    print(f"[profile] {n_params/1e6:.2f}M params, "
          f"{flops/1e9:.2f} GFLOP/img -> {args.out}/profile.json")


if __name__ == "__main__":
    main()
