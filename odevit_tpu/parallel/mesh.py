"""Device mesh construction and sharding policies.

The reference is strictly single-GPU (SURVEY.md section 2: no
torch.distributed anywhere); scaling here is new capability, constrained
to reproduce single-replica semantics:

* ``data`` axis — batch data parallelism over ICI; gradients are reduced
  by XLA's all-reduce automatically under jit (no hand-written NCCL).
* ``model`` axis — optional tensor parallelism over attention heads and
  the MLP hidden dim. The models are 0.5-7M params, so TP is never needed
  for memory; it exists for latency scaling and to exercise multi-axis
  sharding. Defaults to 1.

Everything is GSPMD: annotate shardings on params/batch, jit the step,
let XLA insert collectives over ICI.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_data: Optional[int] = None, num_model: int = 1,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // num_model
    assert num_data * num_model == len(devices), (
        f"{num_data}x{num_model} mesh != {len(devices)} devices")
    arr = np.array(devices).reshape(num_data, num_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _tp_spec(path_keys, leaf) -> P:
    """Tensor-parallel PartitionSpec for a ViTODE/Macaron param leaf.

    Column-parallel QKV/fc1 (output features split across 'model'),
    row-parallel out/fc2 (input features split) — the Megatron pattern,
    expressed purely as shardings; XLA inserts the all-reduces.
    """
    name = "/".join(path_keys)
    if leaf.ndim == 2:
        if name.endswith(("attn/qkv_kernel", "attn/q_kernel",
                          "attn/k_kernel", "attn/v_kernel",
                          "mlp/fc1_kernel", "ffn/fc1/kernel")):
            return P(None, "model")
        if name.endswith(("attn/out_kernel", "mlp/fc2_kernel",
                          "ffn/fc2/kernel")):
            return P("model", None)
    return P()


def param_shardings(params, mesh: Mesh, tensor_parallel: bool = False):
    """NamedSharding pytree for the params: replicated, or TP over 'model'."""

    def leaf_sharding(path, leaf):
        if tensor_parallel and mesh.shape["model"] > 1:
            keys = [p.key for p in path if hasattr(p, "key")]
            return NamedSharding(mesh, _tp_spec(keys, leaf))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def shard_pytree(tree, shardings):
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
