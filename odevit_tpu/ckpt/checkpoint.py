"""Checkpointing: orbax save/restore with best-metric gating, plus torch
.pt import for reference-trained checkpoints.

Replaces the reference's utils.py:161-224 (torch.save of
{optimizer, state_dict, lr_scheduler} gated by a string-eval comparison —
the eval() is NOT reproduced; comparison is a plain operator). Layout:

    <dir>/<name>/step/...        orbax PyTree: {params, opt_state, step}
    <dir>/<name>/meta.json       {best_metric, lr, step, compare}
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(path)


class CheckpointManager:
    def __init__(self, directory: str, name: str, use_async: bool = True):
        self.dir = _abs(os.path.join(directory, name))
        os.makedirs(self.dir, exist_ok=True)
        # async by default: the save overlaps the next training epoch
        # (StandardCheckpointer is already an AsyncCheckpointer in orbax;
        # wait_until_finished() in save() makes the best-metric gating
        # race-free; pass use_async=False for strict sync semantics)
        self._ckptr = ocp.StandardCheckpointer()
        self._async = use_async

    @property
    def meta_path(self):
        return os.path.join(self.dir, "meta.json")

    def save(self, state, *, metric: float, lr: float = 0.0,
             force: bool = False, compare: str = ">") -> bool:
        """Save iff ``metric`` improves on the stored best (or force)."""
        best = self.best_metric(default=-np.inf if compare == ">" else np.inf)
        improved = metric > best if compare == ">" else metric < best
        if not (improved or force):
            return False
        path = os.path.join(self.dir, "state")
        self._ckptr.save(path, state, force=True)
        if not self._async:
            self._ckptr.wait_until_finished()
        with open(self.meta_path, "w") as f:
            json.dump({"best_metric": float(metric), "lr": float(lr),
                       "step": int(jax.device_get(state.step)),
                       "compare": compare}, f)
        return True

    def best_metric(self, default: float = -np.inf) -> float:
        if os.path.exists(self.meta_path):
            with open(self.meta_path) as f:
                return float(json.load(f)["best_metric"])
        return default

    def wait(self):
        self._ckptr.wait_until_finished()

    def restore_params(self, params_target):
        """Params-only partial restore (serving/eval: no optimizer state
        needed, and the saved opt-state layout may belong to a different
        optimizer than the caller's)."""
        self.wait()
        path = os.path.join(self.dir, "state")
        restored = ocp.PyTreeCheckpointer().restore(
            path, args=ocp.args.PyTreeRestore(
                item={"params": params_target}, partial_restore=True))
        return restored["params"]

    def restore(self, target_state):
        """Restore into the structure of ``target_state`` (shapes/dtypes
        must match; shardings follow the target)."""
        self.wait()
        path = os.path.join(self.dir, "state")
        restored = self._ckptr.restore(path, target_state)
        meta = {}
        if os.path.exists(self.meta_path):
            with open(self.meta_path) as f:
                meta = json.load(f)
        return restored, meta

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.dir, "state"))


# --- torch .pt import (reference checkpoints) ---------------------------

def _torch_linear(sd, name):
    return {"kernel": np.asarray(sd[f"{name}.weight"]).T,
            "bias": np.asarray(sd[f"{name}.bias"])}


def load_reference_vitode_checkpoint(path: str, *, embed_dim: int,
                                     l2_attention: bool = False):
    """Map a reference ViTNeuralODE torch checkpoint
    ({'state_dict': ...} or a bare state_dict) onto our param tree.

    Name mapping (reference -> ours):
      patch_embed.proj.{weight,bias}        -> patch_embed.proj_{kernel,bias}
      patch_embed.{cls_token,register_tokens,pos_embed,dist_token}
      odefunc.block.norm_attn/.norm_mlp     -> vf.norm_attn/.norm_mlp
      odefunc.block.attn.mha.in_proj_weight -> vf.attn.qkv_kernel
      odefunc.block.attn.mha.out_proj.weight-> vf.attn.out_kernel
      odefunc.block.attn.{q,k,v,out}_proj   -> vf.attn.{q,k,v,out}_* (L2)
      odefunc.block.mlp.fc{1,2}.weight      -> vf.mlp.fc{1,2}_kernel
      head.{weight,bias}                    -> head.{kernel,bias}
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    sd = obj["state_dict"] if isinstance(obj, dict) and "state_dict" in obj \
        else obj
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}

    conv = sd["patch_embed.proj.weight"]            # [D, C, p, p]
    params: dict = {
        "patch_embed": {
            "proj_kernel": conv.reshape(conv.shape[0], -1).T,
            "proj_bias": sd["patch_embed.proj.bias"],
            "cls_token": sd["patch_embed.cls_token"],
            "pos_embed": sd["patch_embed.pos_embed"],
        },
        "head": {"kernel": sd["head.weight"].T, "bias": sd["head.bias"]},
        "vf": {
            "norm_attn": {"scale": sd["odefunc.block.norm_attn.weight"],
                          "bias": sd["odefunc.block.norm_attn.bias"]},
            "norm_mlp": {"scale": sd["odefunc.block.norm_mlp.weight"],
                         "bias": sd["odefunc.block.norm_mlp.bias"]},
            "mlp": {"fc1_kernel": sd["odefunc.block.mlp.fc1.weight"].T,
                    "fc2_kernel": sd["odefunc.block.mlp.fc2.weight"].T},
        },
    }
    if "patch_embed.register_tokens" in sd:
        params["patch_embed"]["register_tokens"] = \
            sd["patch_embed.register_tokens"]
    if "patch_embed.dist_token" in sd:
        params["patch_embed"]["dist_token"] = sd["patch_embed.dist_token"]
    if "dist_head.weight" in sd:
        params["dist_head"] = {"kernel": sd["dist_head.weight"].T,
                               "bias": sd["dist_head.bias"]}
    if l2_attention:
        params["vf"]["attn"] = {}
        for p in ("q", "k", "v"):
            lin = _torch_linear(sd, f"odefunc.block.attn.{p}_proj")
            params["vf"]["attn"][f"{p}_kernel"] = lin["kernel"]
            params["vf"]["attn"][f"{p}_bias"] = lin["bias"]
        out = _torch_linear(sd, "odefunc.block.attn.out_proj")
        params["vf"]["attn"]["out_kernel"] = out["kernel"]
        params["vf"]["attn"]["out_bias"] = out["bias"]
    else:
        params["vf"]["attn"] = {
            "qkv_kernel": sd["odefunc.block.attn.mha.in_proj_weight"].T,
            "out_kernel": sd["odefunc.block.attn.mha.out_proj.weight"].T,
        }
    return jax.tree_util.tree_map(np.asarray, params)
