"""Model-FLOPs accounting and MFU (model-flops utilization).

The reference profiles FLOPs offline with ``thop``
(evaluate_performance_memory.ipynb cells 6-10); here FLOPs are an
analytic model over the matmul inventory (the MXU work — elementwise and
norm work is bandwidth-, not FLOP-bound), so they are *model* FLOPs in
the MFU sense: hand-counted theoretical work, independent of how the
compiler or the Pallas kernels schedule it. XLA's own cost analysis
can't serve here — it counts custom calls (Pallas kernels) as zero.

MFU convention: train FLOPs = 3x forward (fwd + 2x backward for
matmul-dominated graphs); remat recompute is NOT counted (it is real
chip work but not model work — counting it would inflate MFU).
Peak: 197 bf16 TFLOP/s per v5e chip.
"""

from __future__ import annotations

PEAK_BF16_V5E = 197e12


def _mm(m, n, k):
    return 2.0 * m * n * k


def vf_eval_flops(n: int, d: int, dh: int) -> float:
    """One vector-field evaluation (ParallelAttentionMLP) per image:
    QKV + scores + attn@V + out-proj + 2-layer MLP."""
    return (_mm(n, 3 * d, d)          # qkv
            + _mm(n, n, d)            # q@k^T (all heads: 2*H*N^2*hd)
            + _mm(n, n, d)            # p@v
            + _mm(n, d, d)            # out proj
            + _mm(n, dh, d)           # fc1
            + _mm(n, d, dh))          # fc2


def num_tokens(model) -> int:
    return ((model.img_size // model.patch_size) ** 2 + 1
            + getattr(model, "register_tokens", 0)
            + (1 if getattr(model, "add_distillation_token", False) else 0))


def vit_ode_fwd_flops(model) -> float:
    """ViTODE forward per image (patch embed + NFE vector-field
    evaluations + head)."""
    from odevit_tpu.core.integrators import nfe
    n = num_tokens(model)
    d = model.embed_dim
    dh = int(d * model.mlp_ratio)
    evals = nfe(model.solver, model.num_eval_steps)
    patches = (model.img_size // model.patch_size) ** 2
    pe = _mm(patches, d, 3 * model.patch_size ** 2)
    head = _mm(1, model.num_classes, d)
    return pe + evals * vf_eval_flops(n, d, dh) + head


def macaron_fwd_flops(model) -> float:
    """ViTMacaron forward per image. The macaron block runs the shared
    FFN twice (half before, half after attention) per evaluation."""
    from odevit_tpu.core.integrators import nfe
    n = (model.img_size // model.patch_size) ** 2 + 1
    d = model.embed_dim
    dh = int(d * model.mlp_ratio)
    evals = nfe(model.solver, model.num_eval_steps)
    per_eval = (_mm(n, 3 * d, d) + _mm(n, n, d) + _mm(n, n, d)
                + _mm(n, d, d) + 2 * (_mm(n, dh, d) + _mm(n, d, dh)))
    patches = (model.img_size // model.patch_size) ** 2
    pe = _mm(patches, d, 3 * model.patch_size ** 2)
    return pe + evals * per_eval + _mm(1, model.num_classes, d)


def vit_teacher_fwd_flops(teacher) -> float:
    """Standard ViT encoder forward per image (the frozen teacher)."""
    n = (teacher.image_size // teacher.patch_size) ** 2 + 1
    d = teacher.hidden_size
    dh = teacher.mlp_dim
    per_layer = (_mm(n, 3 * d, d) + _mm(n, n, d) + _mm(n, n, d)
                 + _mm(n, d, d) + _mm(n, dh, d) + _mm(n, d, dh))
    patches = (teacher.image_size // teacher.patch_size) ** 2
    pe = _mm(patches, d, 3 * teacher.patch_size ** 2)
    return pe + teacher.num_layers * per_layer + _mm(
        1, teacher.num_classes, d)


def train_step_flops(model, batch: int, *, kind: str = "vit") -> float:
    """Model FLOPs of one free-training step (fwd + 2x bwd)."""
    fwd = macaron_fwd_flops(model) if kind == "macaron" \
        else vit_ode_fwd_flops(model)
    return 3.0 * fwd * batch


def distill_step_flops(student, teacher, batch: int) -> float:
    """One TS distillation step: frozen teacher fwd + student fwd+bwd.
    ``teacher=None`` counts the teacher-cache step (student only)."""
    t = vit_teacher_fwd_flops(teacher) if teacher is not None else 0.0
    return (t + 3.0 * vit_ode_fwd_flops(student)) * batch


def mfu(flops_per_step: float, step_seconds: float,
        peak: float = PEAK_BF16_V5E) -> dict:
    """{'tflops_per_sec', 'mfu'} for a measured step time."""
    achieved = flops_per_step / step_seconds
    return {"tflops_per_sec": round(achieved / 1e12, 2),
            "mfu": round(achieved / peak, 4)}
