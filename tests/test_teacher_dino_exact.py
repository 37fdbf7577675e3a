"""HF-exact converter fixture for `facebook/dino-vitb16` (VERDICT r3
item 5a).

This environment has no network egress, so the one seam between this
repo and a *real* DINO teacher checkpoint — the exact key names, shapes,
prefixing and pooler handling of `facebook/dino-vitb16` — is verified
against a torch re-statement: HF's own `ViTModel`/
`ViTForImageClassification` classes at the verbatim DINO-B/16 config
produce byte-identical state-dict layouts to the hub checkpoint (the hub
file is just `save_pretrained` of these classes). The reference loads
the teacher via `ViTForImageClassification.from_pretrained(
'facebook/dino-vitb16')` (main_classification_ode_distillation.py:80-82),
which adds the `vit.` prefix, DROPS the pooler, and fresh-initializes
`classifier.*`.
"""

import numpy as np
import torch

import jax.numpy as jnp

from odevit_tpu.teacher.convert import torch_vit_to_flax
from odevit_tpu.teacher.vit import ViTTeacher


def _dino_b16_config():
    from transformers import ViTConfig
    # the verbatim facebook/dino-vitb16 config.json values
    return ViTConfig(image_size=224, patch_size=16, hidden_size=768,
                     num_hidden_layers=12, num_attention_heads=12,
                     intermediate_size=3072, hidden_act="gelu",
                     layer_norm_eps=1e-12, qkv_bias=True,
                     attn_implementation="eager")


def _expected_raw_keys():
    """The exact key set of the `facebook/dino-vitb16` hub checkpoint
    (a `ViTModel` save: un-prefixed, WITH pooler, no classifier)."""
    keys = {
        "embeddings.cls_token",
        "embeddings.position_embeddings",
        "embeddings.patch_embeddings.projection.weight",
        "embeddings.patch_embeddings.projection.bias",
        "layernorm.weight", "layernorm.bias",
        "pooler.dense.weight", "pooler.dense.bias",
    }
    for i in range(12):
        p = f"encoder.layer.{i}"
        for leaf in ("attention.attention.query",
                     "attention.attention.key",
                     "attention.attention.value",
                     "attention.output.dense",
                     "intermediate.dense", "output.dense",
                     "layernorm_before", "layernorm_after"):
            keys.add(f"{p}.{leaf}.weight")
            keys.add(f"{p}.{leaf}.bias")
    return keys


def test_dino_b16_raw_statedict_keys_and_shapes():
    """ViTModel at the DINO config re-states the hub checkpoint layout;
    our hardcoded expectation (what the converter is written against)
    must match it exactly — incl. pooler presence and no prefix."""
    from transformers import ViTModel
    model = ViTModel(_dino_b16_config(), add_pooling_layer=True)
    sd = model.state_dict()
    assert set(sd.keys()) == _expected_raw_keys()
    assert tuple(sd["embeddings.cls_token"].shape) == (1, 1, 768)
    assert tuple(sd["embeddings.position_embeddings"].shape) == (1, 197, 768)
    assert tuple(
        sd["embeddings.patch_embeddings.projection.weight"].shape
    ) == (768, 3, 16, 16)
    assert tuple(
        sd["encoder.layer.0.intermediate.dense.weight"].shape) == (3072, 768)
    assert tuple(
        sd["encoder.layer.0.output.dense.weight"].shape) == (768, 3072)
    assert tuple(sd["pooler.dense.weight"].shape) == (768, 768)

    # converter must tolerate the pooler keys (raw hub layout) and not
    # emit a classifier when none exists
    params = torch_vit_to_flax(sd, num_layers=12)
    assert "classifier" not in params
    assert params["patch_kernel"].shape == (3 * 16 * 16, 768)
    assert params["position_embeddings"].shape == (1, 197, 768)
    assert set(params) == ({"cls_token", "position_embeddings",
                            "patch_kernel", "patch_bias", "layernorm"}
                           | {f"layer_{i}" for i in range(12)})


def test_dino_b16_classification_form_golden_forward():
    """The reference's actual load path: ViTForImageClassification at the
    DINO config (`vit.`-prefixed keys, no pooler, fresh classifier).
    Convert the full-size state dict and golden-test logits, all 13
    hidden states, and all 12 attention maps at 224px against the torch
    forward — the end-to-end converter seam at real scale."""
    from transformers import ViTForImageClassification
    cfg = _dino_b16_config()
    cfg.num_labels = 100
    torch.manual_seed(0)
    hf = ViTForImageClassification(cfg).eval()
    sd = hf.state_dict()
    assert all(k.startswith("vit.") or k.startswith("classifier.")
               for k in sd)
    assert not any("pooler" in k for k in sd)

    params = torch_vit_to_flax(sd, num_layers=12)
    assert params["classifier"]["kernel"].shape == (768, 100)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.tensor(x), output_hidden_states=True,
                  output_attentions=True)

    flax_model = ViTTeacher.dino_b16(num_classes=100)
    got = flax_model.apply({"params": params},
                           jnp.asarray(x.transpose(0, 2, 3, 1)))

    np.testing.assert_allclose(np.asarray(got["logits"]),
                               want.logits.numpy(), atol=1e-4, rtol=1e-4)
    assert got["hidden_states"].shape == (13, 1, 197, 768)
    for i in range(13):
        np.testing.assert_allclose(
            np.asarray(got["hidden_states"][i]),
            want.hidden_states[i].numpy(), atol=2e-4, rtol=2e-4,
            err_msg=f"hidden state {i}")
    assert got["attentions"].shape == (12, 1, 12, 197, 197)
    for i in range(12):
        np.testing.assert_allclose(
            np.asarray(got["attentions"][i]),
            want.attentions[i].numpy(), atol=1e-5, rtol=1e-4,
            err_msg=f"attention {i}")
