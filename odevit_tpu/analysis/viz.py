"""Visualization utilities (parity: /root/reference/utils.py:51-158 and
the attention-video cells of attention_visualizations.ipynb).

Image grids, animated GIFs, 3D trajectory plots (single and
teacher-vs-student), attention-evolution video export. matplotlib Agg +
imageio — no ffmpeg dependency required (imageio falls back to GIF when
no mp4 codec is present).

PROVENANCE: the four plot helpers below (upscale_image,
create_image_grid, create_animated_gif, plot_3d_trajectory /
plot_merged_3d_trajectories) deliberately MIRROR the reference's
matplotlib code (utils.py:51-158) including its arbitrary style
constants (grid cols=7, bicubic scale=16, figsizes, fontsizes), so the
figures this framework emits are visually comparable 1:1 with the
paper's artifacts. This is host-side matplotlib with no TPU dimension —
there is nothing to re-design; treat these functions as a styled
re-statement of the reference plots, not original work. attention_video
and _render_heat_frame below are original (the reference's producing
notebook cell used an FFMpegWriter pipeline)."""

from __future__ import annotations

import io
from typing import Optional

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def upscale_image(image: np.ndarray, scale: int = 16) -> np.ndarray:
    from PIL import Image
    arr = (image * 255).astype(np.uint8) if image.max() <= 1 \
        else image.astype(np.uint8)
    img = Image.fromarray(arr)
    new_size = (image.shape[1] * scale, image.shape[0] * scale)
    return np.array(img.resize(new_size, resample=Image.BICUBIC))


def create_image_grid(images: np.ndarray, title: str = "Trajectory Steps"):
    plt = _plt()
    n = images.shape[0]
    cols = min(n, 7)
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(cols * 2, rows * 2))
    axes = np.array(axes).reshape(-1)
    for i, ax in enumerate(axes):
        ax.axis("off")
        if i < n:
            img = upscale_image(images[i])
            ax.imshow(img / 255.0 if img.max() > 1 else img)
            ax.set_title(f"Step {i}", fontsize=8)
    fig.suptitle(title, fontsize=14)
    fig.tight_layout()
    return fig


def create_animated_gif(images, duration: float = 0.5, dpi: int = 100):
    """Returns a BytesIO with an animated GIF of the frames."""
    import imageio
    plt = _plt()
    frames = []
    for i, img in enumerate(images):
        img = upscale_image(np.asarray(img))
        fig, ax = plt.subplots(figsize=(4, 4), dpi=dpi)
        ax.imshow(img if img.max() <= 1 else img / 255.0)
        ax.axis("off")
        ax.set_title(f"Step {i}", fontsize=10)
        buf = io.BytesIO()
        fig.savefig(buf, format="png", bbox_inches="tight")
        buf.seek(0)
        frames.append(imageio.v2.imread(buf))
        plt.close(fig)
    gif = io.BytesIO()
    imageio.mimsave(gif, frames, format="gif", duration=duration)
    gif.seek(0)
    return gif


def plot_3d_trajectory(points: np.ndarray, title: str = "Trajectory",
                       elev: int = 30, azim: int = 135):
    plt = _plt()
    fig = plt.figure(figsize=(5, 4))
    ax = fig.add_subplot(111, projection="3d")
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    ax.plot(x, y, z, color="blue", linewidth=2)
    ax.scatter(x, y, z, c="red", s=50)
    for i, (xi, yi, zi) in enumerate(points):
        ax.text(xi, yi, zi, str(i), fontsize=8)
    ax.set_title(title)
    ax.view_init(elev=elev, azim=azim)
    return fig


def _minmax(traj):
    lo = traj.min(axis=0, keepdims=True)
    hi = traj.max(axis=0, keepdims=True)
    return (traj - lo) / (hi - lo + 1e-8)


def plot_merged_3d_trajectories(teacher_points, student_points,
                                title: str = "Teacher vs Student",
                                elev: int = 30, azim: int = 135):
    plt = _plt()
    fig = plt.figure(figsize=(6, 5))
    ax = fig.add_subplot(111, projection="3d")
    for pts, color, tag in ((_minmax(np.asarray(teacher_points)), "blue",
                             "T"),
                            (_minmax(np.asarray(student_points)), "orange",
                             "S")):
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        ax.plot(x, y, z, color=color, linewidth=2,
                label="Teacher" if tag == "T" else "Student")
        ax.scatter(x, y, z, c=color, s=50)
        for i, (xi, yi, zi) in enumerate(pts):
            ax.text(xi, yi, zi, f"{tag}{i}", fontsize=8, color=color)
    ax.set_title(title)
    ax.view_init(elev=elev, azim=azim)
    ax.legend()
    return fig


def attention_video(attn_trajectory, out_path: str, *, image=None,
                    threshold: float = 0.5, fps: int = 4,
                    overlay_alpha: float = 0.5):
    """Attention-evolution video: per-evaluation thresholded mean CLS
    attention (extract_mass), optionally alpha-blended over the input
    image. attn_trajectory: [E, B, H, N, N] (registers stripped); frame
    = batch element 0. Writes mp4 when imageio-ffmpeg is available, else
    GIF next to the requested path. Returns the written path."""
    import imageio
    import jax
    import jax.numpy as jnp
    from odevit_tpu.losses.attention_distill import extract_mass

    traj = np.asarray(attn_trajectory)
    rows = jnp.asarray(traj[:, 0, :, 0, 1:])           # [E, H, N-1]
    # one jitted call for every frame's thresholded mass (per-frame eager
    # dispatch is seconds-per-frame on TPU)
    mean_mass, _, _ = jax.jit(
        lambda r: extract_mass(r, threshold=threshold))(rows)
    heats = np.asarray(mean_mass)                      # [E, h, w]
    frames = []
    for e in range(heats.shape[0]):
        heat = heats[e] / (heats[e].max() + 1e-12)
        frames.append(_render_heat_frame(heat, image, overlay_alpha))
    # pillow (gif) wants per-frame duration in ms; ffmpeg (mp4) wants fps
    if out_path.endswith(".gif"):
        imageio.mimsave(out_path, frames, duration=1000.0 / fps)
        return out_path
    try:
        imageio.mimsave(out_path, frames, fps=fps)
        return out_path
    except Exception:
        alt = out_path.rsplit(".", 1)[0] + ".gif"
        imageio.mimsave(alt, frames, duration=1000.0 / fps)
        return alt


def _render_heat_frame(heat, image, alpha):
    plt = _plt()
    import matplotlib
    rgba = matplotlib.colormaps["inferno"](heat)[..., :3]
    if image is not None:
        img = np.asarray(image, np.float32)
        if img.max() > 1:
            img = img / 255.0
        from PIL import Image
        h = Image.fromarray((rgba * 255).astype(np.uint8)).resize(
            (img.shape[1], img.shape[0]), Image.BILINEAR)
        rgba = np.asarray(h, np.float32) / 255.0
        out = (1 - alpha) * img + alpha * rgba
    else:
        out = rgba
    return (np.clip(out, 0, 1) * 255).astype(np.uint8)
