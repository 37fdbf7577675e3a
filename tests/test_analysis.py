"""Analysis subsystem tests: PCA, Koopman/DMD, Lyapunov, rollout, viz."""

import io
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from odevit_tpu.analysis.pca import (align_trajectories,
                                     analyse_pca_stability, pca_components,
                                     perform_pca_lowrank,
                                     project_onto_subspace)
from odevit_tpu.analysis.koopman import (fit_koopman, koopman_spectrum,
                                         predict_trajectory)
from odevit_tpu.analysis.lyapunov import (max_lyapunov_exponent,
                                          model_lyapunov_records)
from odevit_tpu.analysis.rollout import (attention_rollout, cls_heatmap,
                                         export_trajectory)
from odevit_tpu.analysis import viz
from odevit_tpu.analysis.profiling import (count_params, flops_estimate,
                                           measure_latency)


def test_pca_lowrank_recovers_principal_direction():
    rng = np.random.default_rng(0)
    direction = np.array([3.0, 1.0, 0.2, 0.1])
    direction /= np.linalg.norm(direction)
    a = rng.standard_normal((500, 1)) * 5 * direction[None] \
        + 0.1 * rng.standard_normal((500, 4))
    _, s, v = perform_pca_lowrank(jnp.asarray(a), n_eigenvectors=2)
    top = np.asarray(v[:, 0])
    assert abs(np.dot(top, direction)) > 0.99
    proj = project_onto_subspace(jnp.asarray(a), v, k=2)
    assert proj.shape == (500, 2)


def test_procrustes_alignment():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((20, 3))
    theta = 0.7
    r = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1.0]])
    y = x @ r.T
    aligned = align_trajectories(x, y)
    np.testing.assert_allclose(aligned, x, atol=1e-6)


def test_pca_components_ratio_sums():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((100, 8))
    comps, ratio = pca_components(jnp.asarray(a), n_components=8)
    assert comps.shape == (8, 8)
    np.testing.assert_allclose(float(jnp.sum(ratio)), 1.0, atol=1e-5)


def test_analyse_pca_stability(tmp_path):
    rng = np.random.default_rng(3)
    a = rng.standard_normal((300, 6))
    angles, variances = analyse_pca_stability(
        jnp.asarray(a), n_components=3, sample_sizes=(50, 100),
        plot_dir=str(tmp_path))
    assert len(angles) == 2 and variances.shape == (2, 3)
    assert (tmp_path / "pca_cosine_similarity.png").exists()
    assert (tmp_path / "pca_explained_variance.png").exists()


def test_koopman_recovers_linear_dynamics():
    rng = np.random.default_rng(4)
    # stable rotation operator
    theta = 0.3
    k_true = 0.95 * np.array([[np.cos(theta), -np.sin(theta)],
                              [np.sin(theta), np.cos(theta)]])
    g = [rng.standard_normal(2)]
    for _ in range(40):
        g.append(k_true @ g[-1])
    traj = np.stack(g)
    model = fit_koopman(jnp.asarray(traj))
    np.testing.assert_allclose(np.asarray(model.k), k_true, atol=1e-4)
    mags, _ = koopman_spectrum(model)
    np.testing.assert_allclose(np.sort(np.asarray(mags)), [0.95, 0.95],
                               atol=1e-4)
    pred = predict_trajectory(jnp.asarray(traj[0]), model, horizon=10)
    np.testing.assert_allclose(np.asarray(pred.real)[10], traj[10],
                               atol=1e-3)


def test_lyapunov_linear_system():
    # dx/dt = A x with known eigenvalues: lambda_max = max Re(eig)
    a = np.diag([0.5, -1.0, -2.0]).astype(np.float32)

    def f(t, x):
        return x @ jnp.asarray(a).T

    x0 = jnp.asarray(np.random.default_rng(5)
                     .standard_normal((4, 3)).astype(np.float32))
    ts = jnp.linspace(0.0, 8.0, 400)
    # tangent along the dominant eigendirection: exact exponent; a random
    # tangent carries a log|v0.e1|/T transient (finite-time estimate)
    v0 = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (4, 3))
    lam = max_lyapunov_exponent(f, x0, ts, v0=v0, method="rk4")
    np.testing.assert_allclose(np.asarray(lam), 0.5 * np.ones(4), atol=0.01)
    # random tangent converges there too, just more slowly (longer horizon)
    ts_long = jnp.linspace(0.0, 40.0, 2000)
    lam_r = max_lyapunov_exponent(f, x0, ts_long, method="rk4")
    np.testing.assert_allclose(np.asarray(lam_r), 0.5 * np.ones(4),
                               atol=0.1)


def test_model_lyapunov_records():
    from odevit_tpu.models.vit_ode import ViTODE
    m = ViTODE(img_size=8, patch_size=4, embed_dim=16, num_heads=2,
               num_classes=3, num_eval_steps=4, solver="euler",
               register_tokens=0)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((4, 8, 8, 3)).astype(np.float32))
    labels = np.array([0, 1, 2, 0])
    v = m.init(jax.random.PRNGKey(0), x)
    records = model_lyapunov_records(m, v, x, labels)
    assert set(records) <= {0, 1, 2}
    rec = records[0][0]
    assert len(rec) == 5
    assert rec[1] == rec[3] == 0          # true class twice (ref layout)
    assert np.isfinite(rec[4])


def test_attention_rollout_identity():
    # pure-diagonal attention -> rollout stays identity
    e, b, h, n = 3, 2, 2, 5
    eye = np.eye(n, dtype=np.float32)
    maps = np.broadcast_to(eye, (e, b, h, n, n))
    roll = attention_rollout(jnp.asarray(maps))
    np.testing.assert_allclose(np.asarray(roll),
                               np.broadcast_to(eye, (b, n, n)), atol=1e-6)
    heat = cls_heatmap(roll, grid_size=2)
    assert heat.shape == (b, 2, 2)


def test_export_trajectory_and_video(tmp_path):
    from odevit_tpu.models.vit_ode import ViTODE
    m = ViTODE(img_size=16, patch_size=4, embed_dim=16, num_heads=2,
               num_classes=3, num_eval_steps=4, solver="euler",
               register_tokens=0)
    x = jnp.ones((1, 16, 16, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    out = export_trajectory(m, v, x, jasmin_k=1)
    assert out["states"].shape[0] == 4
    assert out["attention_trajectory"].shape[0] == 3
    path = viz.attention_video(out["attention_trajectory"],
                               str(tmp_path / "attn.gif"),
                               image=np.ones((16, 16, 3)), fps=2)
    assert os.path.exists(path) and os.path.getsize(path) > 0


def test_viz_helpers():
    imgs = np.random.default_rng(0).random((4, 6, 6, 3)).astype(np.float32)
    fig = viz.create_image_grid(imgs)
    assert fig is not None
    gif = viz.create_animated_gif(imgs[:2], duration=0.1)
    assert isinstance(gif, io.BytesIO) and gif.getbuffer().nbytes > 0
    pts = np.random.default_rng(1).random((5, 3))
    assert viz.plot_3d_trajectory(pts) is not None
    assert viz.plot_merged_3d_trajectories(pts, pts + 0.1) is not None


def test_profiling_helpers():
    from odevit_tpu.models.vit_ode import ViTODE
    m = ViTODE(img_size=8, patch_size=4, embed_dim=16, num_heads=2,
               num_classes=3, num_eval_steps=3, solver="euler",
               register_tokens=0)
    x = jnp.ones((1, 8, 8, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    assert count_params(v["params"]) > 0
    fn = lambda p, x: m.apply({"params": p}, x)["logits"]
    flops = flops_estimate(fn, v["params"], x)
    assert flops > 0
    lat = measure_latency(jax.jit(fn), v["params"], x, iters=2)
    assert lat["mean_s"] > 0
