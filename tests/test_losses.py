"""Loss/schedule golden tests vs torch/HF/scipy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from odevit_tpu.losses.jasmin import (jasmin_loss, jasmin_map_loss,
                                      jasmin_trajectory_window)
from odevit_tpu.losses.control_points import (proportional_control_points,
                                              VIT_LAYER_DISPLACEMENTS)
from odevit_tpu.losses.trajectory import (trajectory_mse,
                                          uniform_checkpoints,
                                          weighted_full_path_mse)
from odevit_tpu.losses.attention_distill import (extract_mass,
                                                 gaussian_blur_2d,
                                                 l1_attention_loss)
from odevit_tpu.losses.classification import (cross_entropy, logit_kd_loss,
                                              topk_accuracies)
from odevit_tpu.losses.bounds import finite_difference_upper_bound
from odevit_tpu.train.schedules import (cosine_hard_restarts_with_warmup,
                                        TemperatureScheduler)


def torch_jasmin(attn_maps, k=0):
    """Independent torch oracle of the documented JaSMin math."""
    losses = []
    for P in attn_maps:
        P = torch.clamp(P, min=1e-12, max=1.0)
        P = P / (P.sum(dim=-1, keepdim=True) + 1e-12)
        s, _ = torch.sort(P, dim=-1, descending=True)

        def g(kk):
            xk = s[..., kk - 1]
            xk1 = s[..., kk] if kk < P.size(-1) else torch.zeros_like(xk)
            return xk * (1 - xk + xk1)

        g1 = g(1)
        if k == 0:
            loss = torch.log(g1 + 1e-12)
        else:
            loss = torch.log(g1 / (g(k) + 1e-12) + 1e-12)
        losses.append(loss.max(dim=-1).values.mean(dim=1).mean())
    return torch.stack(losses).mean()


@pytest.mark.parametrize("k", [0, 1, 2, 5])
def test_jasmin_matches_oracle(k):
    rng = np.random.default_rng(0)
    maps = [rng.dirichlet(np.ones(9), size=(2, 3, 9)).astype(np.float32)
            for _ in range(3)]
    got = float(jasmin_loss([jnp.array(m) for m in maps], k=k))
    want = float(torch_jasmin([torch.tensor(m) for m in maps], k=k))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_jasmin_trajectory_window():
    # 10 evals, T=8 -> window = int(0.85*8) = 6 last entries
    per_eval = jnp.arange(10.0)
    got = float(jasmin_trajectory_window(per_eval, 8))
    np.testing.assert_allclose(got, np.mean(np.arange(10.0)[-6:]))


def test_control_points_match_torch_semantics():
    for temp in (3.0, 30.0, 100.0):
        for T in (24, 36, 48):
            x = torch.tensor(VIT_LAYER_DISPLACEMENTS) / temp
            e = torch.exp(x - x.max())
            steps = torch.round(e / e.sum() * T)
            want = torch.cumsum(steps, 0).long()
            want[-1] = T - 1
            want = torch.clamp(want, 0, T - 1).numpy()
            got = proportional_control_points(T, temp)
            np.testing.assert_array_equal(got, want)


def test_trajectory_mse_full_path():
    rng = np.random.default_rng(1)
    s = rng.standard_normal((4, 2, 5, 8)).astype(np.float32)
    t = rng.standard_normal((4, 2, 6, 8)).astype(np.float32)
    total, parts = trajectory_mse(jnp.array(s), jnp.array(t), full_path=True)
    want = sum(np.mean((t[i, :, 0] - s[i, :, 0]) ** 2) for i in range(4))
    np.testing.assert_allclose(float(total), want, rtol=1e-5)
    assert set(parts) == {f"mse_loss_t@{i}" for i in range(4)}

    last, parts = trajectory_mse(jnp.array(s), jnp.array(t), full_path=False)
    np.testing.assert_allclose(float(last),
                               np.mean((t[-1, :, 0] - s[-1, :, 0]) ** 2),
                               rtol=1e-5)
    assert list(parts) == ["mse_loss_t@3"]


def test_uniform_checkpoints_fallback():
    # loss_trainer.py:261-271 semantics: cumsum of T/Q, last decremented
    idx = uniform_checkpoints(24, 12)
    want = np.cumsum([2.0] * 12).astype(np.int64)
    want[-1] -= 1
    np.testing.assert_array_equal(idx, want)


def test_weighted_full_path_mse():
    rng = np.random.default_rng(2)
    s = rng.standard_normal((3, 2, 4)).astype(np.float32)
    t = rng.standard_normal((3, 2, 4)).astype(np.float32)
    total, _ = weighted_full_path_mse(jnp.array(s), jnp.array(t))
    want = sum((3 - i) * np.mean((t[i] - s[i]) ** 2) for i in range(3)) / 3
    np.testing.assert_allclose(float(total), want, rtol=1e-5)


def test_gaussian_blur_matches_scipy():
    from scipy.ndimage import correlate
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 3, 7, 7)).astype(np.float32)
    got = np.asarray(gaussian_blur_2d(jnp.array(x), 3, 0.5))
    g = np.exp(-0.5 * (np.array([-1.0, 0.0, 1.0]) / 0.5) ** 2)
    g = g / g.sum()
    kern = np.outer(g, g)
    # scipy "mirror" == torch/np "reflect" (edge not repeated)
    want = np.stack([[correlate(x[i, j], kern, mode="mirror")
                      for j in range(3)] for i in range(2)])
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_extract_mass_matches_torch_oracle():
    """Oracle restates loss_trainer.py:80-117 math in torch (blur checked
    separately above; here smooth=False isolates the sort/scatter path)."""
    rng = np.random.default_rng(4)
    a = rng.dirichlet(np.ones(16), size=(2, 3)).astype(np.float32)
    mean_j, filt_j, _ = extract_mass(jnp.array(a), threshold=0.6,
                                     smooth=False)

    at = torch.tensor(a)
    val, idx = torch.sort(at, dim=-1)
    val = val / (val.sum(-1, keepdim=True) + 1e-8)
    cum = torch.cumsum(val, -1)
    mask = (cum > (1 - 0.6)).float()
    th = torch.gather(mask, -1, torch.argsort(idx, -1)).view(2, 3, 4, 4)
    filt = at.view(2, 3, 4, 4) * th
    np.testing.assert_allclose(np.asarray(filt_j), filt.numpy(),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mean_j), filt.mean(1).numpy(),
                               atol=1e-5, rtol=1e-5)


def test_l1_attention_loss_runs_and_scales():
    rng = np.random.default_rng(5)
    s = jnp.array(rng.dirichlet(np.ones(17), size=(2, 3, 17)).astype(np.float32))
    t = jnp.array(rng.dirichlet(np.ones(17), size=(2, 3, 17)).astype(np.float32))
    l1 = l1_attention_loss(s, t, lambda_param=0.5)
    l2 = l1_attention_loss(s, t, lambda_param=1.0)
    np.testing.assert_allclose(float(l1) * 2, float(l2), rtol=1e-6)
    assert float(l1) >= 0


def test_cross_entropy_label_smoothing_matches_torch():
    rng = np.random.default_rng(6)
    logits = rng.standard_normal((4, 7)).astype(np.float32)
    labels = np.array([0, 3, 6, 2])
    got = float(cross_entropy(jnp.array(logits), jnp.array(labels),
                              label_smoothing=0.05))
    want = float(torch.nn.functional.cross_entropy(
        torch.tensor(logits), torch.tensor(labels), label_smoothing=0.05))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_logit_kd_matches_torch():
    rng = np.random.default_rng(7)
    s = rng.standard_normal((4, 7)).astype(np.float32)
    t = rng.standard_normal((4, 7)).astype(np.float32)
    temp, lam = 3.0, 0.5
    got = float(logit_kd_loss(jnp.array(s), jnp.array(t),
                              temperature=temp, lambda_param=lam))
    soft_t = torch.softmax(torch.tensor(t) / temp, -1)
    log_s = torch.log_softmax(torch.tensor(s) / temp, -1)
    want = float(torch.nn.KLDivLoss(reduction="batchmean")(log_s, soft_t)
                 * temp ** 2 * lam)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_topk_accuracies():
    logits = jnp.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    labels = jnp.array([1, 2])
    accs = topk_accuracies(logits, labels, ks=(1, 3))
    assert float(accs["acc@1"]) == 0.5
    assert float(accs["acc@3"]) == 1.0


def test_cosine_hard_restarts_matches_hf():
    from transformers.optimization import \
        get_cosine_with_hard_restarts_schedule_with_warmup
    total, warmup, cycles, base = 200, 10, 3, 1e-4
    opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=base)
    sched = get_cosine_with_hard_restarts_schedule_with_warmup(
        opt, num_warmup_steps=warmup, num_training_steps=total,
        num_cycles=cycles)
    ours = cosine_hard_restarts_with_warmup(base, warmup, total, cycles)
    for step in range(total + 5):
        want = opt.param_groups[0]["lr"]
        got = float(ours(step))
        np.testing.assert_allclose(got, want, atol=1e-9,
                                   err_msg=f"step {step}")
        opt.step()
        sched.step()


def test_temperature_scheduler():
    s = TemperatureScheduler(6.0, 1.5, 100)
    np.testing.assert_allclose(s.get_temp(0), 6.0)
    np.testing.assert_allclose(s.get_temp(100), 1.5)
    assert 1.5 < s.get_temp(50) < 6.0


def test_finite_difference_bound_matches_oracle():
    rng = np.random.default_rng(8)
    states = rng.standard_normal((6, 2, 3, 4)).astype(np.float32)
    L, N = 0.5, 1.0 / 6
    got = finite_difference_upper_bound(jnp.array(states), L, N)

    st = torch.tensor(states)
    dt = 1.0 / N
    second = (st[2:] - 2 * st[1:-1] + st[:-2]) / dt ** 2
    curv = torch.norm(second, p=float("inf"), dim=-1)
    ff = (np.e ** L - 1) / (2 * L * N)
    np.testing.assert_allclose(float(got["global_upper_bound"]),
                               float(ff * curv.max()), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got["batched_upper_bound"]),
                               (ff * curv.max(0)[0].max(-1)[0]).numpy(),
                               rtol=1e-5)


def test_jasmin_handles_exact_ties():
    # identical tokens -> exactly tied attention values; order statistics
    # must count duplicates (x_(1) == x_(2) when the top value repeats)
    row = np.array([0.3, 0.3, 0.2, 0.1, 0.1], np.float32)
    maps = jnp.asarray(np.broadcast_to(row, (1, 1, 5, 5)))
    got = float(jasmin_loss(maps, k=2))
    want = float(torch_jasmin([torch.tensor(np.asarray(maps))], k=2))
    np.testing.assert_allclose(got, want, rtol=1e-5)
