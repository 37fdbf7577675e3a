"""PyTorch -> flax weight conversion for the ViT teacher, plus the
teacher->student grafting used by the distillation entry points.

Conversion handles state dicts from HF ``ViTModel`` and
``ViTForImageClassification`` (with or without the ``vit.`` prefix).
Linear weights transpose ([out,in] -> [in,out]); the patch conv weight
[D, C, p, p] reshapes to [C*p*p, D] matching
:func:`odevit_tpu.ops.patch_embed.patchify`'s channel-major layout.

Grafting parity (main_classification_ode_distillation.py:84-102):
  * patch projection weight copied into the student and frozen
    (conv bias is NOT copied — reference copies only .weight);
  * CLS token shared and frozen;
  * classifier head shared and frozen (unfrozen at the curriculum epoch);
  * position embeddings shared and TRAINABLE (the subtle one).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax.numpy as jnp


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def torch_vit_to_flax(state_dict: Dict[str, Any], num_layers: int = 12,
                      include_classifier: bool = True) -> Dict[str, Any]:
    """Convert an HF ViT torch state_dict to a ViTTeacher params dict."""
    sd = {k.removeprefix("vit."): v for k, v in state_dict.items()}

    def lin(prefix):
        return {"kernel": jnp.asarray(_np(sd[prefix + ".weight"]).T),
                "bias": jnp.asarray(_np(sd[prefix + ".bias"]))}

    def ln(prefix):
        return {"scale": jnp.asarray(_np(sd[prefix + ".weight"])),
                "bias": jnp.asarray(_np(sd[prefix + ".bias"]))}

    conv_w = _np(sd["embeddings.patch_embeddings.projection.weight"])
    d = conv_w.shape[0]
    params: Dict[str, Any] = {
        "cls_token": jnp.asarray(_np(sd["embeddings.cls_token"])),
        "position_embeddings": jnp.asarray(
            _np(sd["embeddings.position_embeddings"])),
        "patch_kernel": jnp.asarray(conv_w.reshape(d, -1).T),
        "patch_bias": jnp.asarray(
            _np(sd["embeddings.patch_embeddings.projection.bias"])),
        "layernorm": ln("layernorm"),
    }
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "layernorm_before": ln(f"{p}.layernorm_before"),
            "layernorm_after": ln(f"{p}.layernorm_after"),
            "query": lin(f"{p}.attention.attention.query"),
            "key": lin(f"{p}.attention.attention.key"),
            "value": lin(f"{p}.attention.attention.value"),
            "attn_output": lin(f"{p}.attention.output.dense"),
            "intermediate": lin(f"{p}.intermediate.dense"),
            "output": lin(f"{p}.output.dense"),
        }
    if include_classifier and "classifier.weight" in sd:
        params["classifier"] = lin("classifier")
    return params


def load_orbax_teacher_params(checkpoint_dir: str):
    """Restore ViTTeacher params from a CheckpointManager directory
    (``<dir>/<name>`` holding ``state`` saved by cli/classification.py —
    the teacher-training entry's own checkpoint layout)."""
    import os

    import jax
    import orbax.checkpoint as ocp

    state_dir = (checkpoint_dir
                 if os.path.basename(checkpoint_dir.rstrip("/")) == "state"
                 else os.path.join(checkpoint_dir, "state"))
    restored = ocp.StandardCheckpointer().restore(os.path.abspath(state_dir))
    params = restored.get("params", restored)
    return jax.tree_util.tree_map(jnp.asarray, params)


def load_teacher_params(checkpoint_path: str, num_layers: int = 12):
    """Load teacher params from a torch .pt/.bin checkpoint, an HF
    save_pretrained directory, or one of our own CheckpointManager
    directories (cli/classification.py output)."""
    import os
    import torch

    if os.path.isdir(checkpoint_path):
        if os.path.isdir(os.path.join(checkpoint_path, "state")) or \
                os.path.basename(checkpoint_path.rstrip("/")) == "state":
            return load_orbax_teacher_params(checkpoint_path)
        from transformers import ViTForImageClassification
        model = ViTForImageClassification.from_pretrained(checkpoint_path)
        sd = model.state_dict()
    else:
        obj = torch.load(checkpoint_path, map_location="cpu",
                         weights_only=True)
        sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return torch_vit_to_flax(sd, num_layers=num_layers)


def graft_teacher_into_student(student_params, teacher_params):
    """Copy/share the teacher's patch projection, CLS token, pos-embed and
    classifier head into a ViTODE student params tree (returns new tree).

    Shapes must line up: embed_dim 768, patch 16, 224px student.
    """
    import flax

    sp = flax.core.unfreeze(student_params) if hasattr(
        flax.core, "unfreeze") else dict(student_params)

    # Copy (never alias) the teacher buffers: the train step donates the
    # student state while the teacher params stay a live argument — shared
    # buffers would trip XLA's donation check (`f(donate(a), a)`).
    def cp(x):
        return jnp.array(x)

    pe = dict(sp["patch_embed"])
    pe["proj_kernel"] = cp(teacher_params["patch_kernel"])
    pe["cls_token"] = cp(teacher_params["cls_token"])
    pe["pos_embed"] = cp(teacher_params["position_embeddings"])
    sp = dict(sp)
    sp["patch_embed"] = pe
    if "classifier" in teacher_params:
        sp["head"] = {"kernel": cp(teacher_params["classifier"]["kernel"]),
                      "bias": cp(teacher_params["classifier"]["bias"])}
    return sp


GRAFT_FROZEN_PATHS = (
    ("patch_embed", "proj_kernel"),
    ("patch_embed", "cls_token"),
    ("head", "kernel"),
    ("head", "bias"),
)
