"""Distillation-criterion composition parity.

The primitive losses are individually golden-tested (jasmin, trajectory
MSE, extract_mass/L1, CE); this validates the CRITERION GLUE of
make_distill_train_step against an independent torch composition
(loss_trainer.py:305-371 semantics): teacher states alignment
(hidden_states[1:]), control-point gather, register stripping, the
lambda-inside-lambda attention weighting, JaSMin addition, and the
curriculum CE gate.
"""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from odevit_tpu.models.vit_ode import ViTODE
from odevit_tpu.teacher.vit import ViTTeacher
from odevit_tpu.train.state import all_trainable, create_train_state, \
    make_optimizer
from odevit_tpu.train.steps import make_distill_train_step

LAM = 0.5


def torch_extract_mass_l1(s_attn, t_attn, lam):
    """Torch restatement of extract_mass(thr .5/.7, smooth) + L1 * lam."""
    from scipy.ndimage import correlate

    def mass(rows, thr):
        rows = torch.tensor(rows)
        b, h, n = rows.shape
        side = int(n ** 0.5 + 0.5)
        val, idx = torch.sort(rows, dim=-1)
        val = val / (val.sum(-1, keepdim=True) + 1e-8)
        cum = torch.cumsum(val, -1)
        soft = torch.sigmoid((cum - (1 - thr)) * 40)
        th = torch.gather(soft, -1, torch.argsort(idx, -1))
        filt = (rows * th).view(b, h, side, side).numpy()
        g = np.exp(-0.5 * (np.array([-1.0, 0, 1.0]) / 0.5) ** 2)
        g /= g.sum()
        kern = np.outer(g, g)
        blurred = np.stack([[correlate(filt[i, j], kern, mode="mirror")
                             for j in range(h)] for i in range(b)])
        return blurred.mean(1)

    s = mass(s_attn, 0.5)
    t = mass(t_attn, 0.7)
    return float(np.abs(s - t).sum() * lam)


def test_distill_criterion_composition():
    student = ViTODE(img_size=16, patch_size=4, embed_dim=24, num_heads=2,
                     mlp_ratio=2.0, num_classes=5, emulate_depth=4,
                     time_interval=1.0, num_eval_steps=8, solver="euler",
                     register_tokens=2, pos_embed_register_tokens=False)
    teacher = ViTTeacher(image_size=16, patch_size=4, hidden_size=24,
                         num_layers=12, num_heads=2, mlp_dim=48,
                         num_classes=5)
    rng = np.random.default_rng(0)
    batch = {"pixel_values": jnp.asarray(
                 rng.standard_normal((4, 16, 16, 3)).astype(np.float32)),
             "labels": jnp.asarray(rng.integers(0, 5, 4))}
    sv = student.init(jax.random.PRNGKey(0), batch["pixel_values"])
    tv = teacher.init(jax.random.PRNGKey(1), batch["pixel_values"])

    # zero-lr optimizer: the step reports metrics without moving params
    tx = make_optimizer(0.0, weight_decay=0.0,
                        trainable_mask=all_trainable(sv["params"]))
    state = create_train_state(sv["params"], tx)
    step = make_distill_train_step(student, teacher, tx, lambda_param=LAM,
                                   jasmin_k=2, mse_full_path=True,
                                   use_distillation=True, donate=False)

    for supervise in (False, True):
        _, metrics = step(state, tv["params"], batch, jax.random.PRNGKey(2),
                          supervise=supervise)

        # independent composition from raw model outputs
        s_out = student.apply(sv, batch["pixel_values"], batch["labels"],
                              output_control_points=True,
                              output_attentions=True, jasmin_k=2)
        t_out = teacher.apply({"params": tv["params"]},
                              batch["pixel_values"])

        ctrl = np.asarray(s_out["control_points"])[:, :, 0]      # [12,B,D]
        t_states = np.asarray(t_out["hidden_states"])[1:, :, 0]  # [12,B,D]
        mse = float(sum(np.mean((t_states[i] - ctrl[i]) ** 2)
                        for i in range(12)))

        l1 = torch_extract_mass_l1(
            np.asarray(s_out["attentions"])[:, :, 0, 1:],
            np.asarray(t_out["attentions"])[-1][:, :, 0, 1:], LAM)

        expected = (mse + l1) * LAM + float(s_out["jasmin_loss"])
        if supervise:
            expected += float(s_out["loss"])

        np.testing.assert_allclose(float(metrics["loss"]), expected,
                                   rtol=2e-3,
                                   err_msg=f"supervise={supervise}")
        np.testing.assert_allclose(float(metrics["mse_loss"]), mse,
                                   rtol=2e-3)
        np.testing.assert_allclose(float(metrics["kl_loss"]), l1, rtol=2e-2)
