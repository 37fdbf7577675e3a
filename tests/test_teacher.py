"""Teacher parity: flax ViT vs HF transformers ViT (random weights).

Runs a tiny config through both and compares logits, every hidden state,
and every attention map. This is the correctness anchor for the whole
distillation path — the trajectory losses compare against these tensors.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from odevit_tpu.teacher.vit import ViTTeacher
from odevit_tpu.teacher.convert import (torch_vit_to_flax,
                                        graft_teacher_into_student)


@pytest.fixture(scope="module")
def tiny_pair():
    from transformers import ViTConfig, ViTForImageClassification
    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=24,
                    num_hidden_layers=3, num_attention_heads=4,
                    intermediate_size=48, num_labels=5,
                    attn_implementation="eager")
    torch.manual_seed(0)
    hf = ViTForImageClassification(cfg).eval()
    flax_model = ViTTeacher(image_size=32, patch_size=8, hidden_size=24,
                            num_layers=3, num_heads=4, mlp_dim=48,
                            num_classes=5)
    params = torch_vit_to_flax(hf.state_dict(), num_layers=3)
    return hf, flax_model, params


def test_teacher_parity_full(tiny_pair):
    hf, flax_model, params = tiny_pair
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        want = hf(torch.tensor(x), output_hidden_states=True,
                  output_attentions=True)

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    got = flax_model.apply({"params": params}, x_nhwc)

    np.testing.assert_allclose(np.asarray(got["logits"]),
                               want.logits.numpy(), atol=2e-5, rtol=2e-5)
    assert got["hidden_states"].shape[0] == 4
    for i in range(4):
        np.testing.assert_allclose(
            np.asarray(got["hidden_states"][i]),
            want.hidden_states[i].numpy(), atol=3e-5, rtol=3e-5,
            err_msg=f"hidden state {i}")
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(got["attentions"][i]),
            want.attentions[i].numpy(), atol=2e-5, rtol=2e-5,
            err_msg=f"attention {i}")


def test_teacher_vit_b16_shapes():
    m = ViTTeacher.dino_b16()
    x = jnp.ones((1, 224, 224, 3))
    params = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x))
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(params))
    assert 85e6 < n < 87e6, n   # ViT-B/16 ~86M params


def test_grafting(tiny_pair):
    hf, flax_model, teacher_params = tiny_pair
    from odevit_tpu.models.vit_ode import ViTODE
    student = ViTODE(img_size=32, patch_size=8, embed_dim=24, num_heads=4,
                     num_classes=5, num_eval_steps=4, solver="euler",
                     register_tokens=2, pos_embed_register_tokens=False)
    x = jnp.ones((1, 32, 32, 3))
    sv = student.init(jax.random.PRNGKey(0), x)
    grafted = graft_teacher_into_student(sv["params"], teacher_params)

    np.testing.assert_array_equal(
        np.asarray(grafted["patch_embed"]["proj_kernel"]),
        np.asarray(teacher_params["patch_kernel"]))
    np.testing.assert_array_equal(
        np.asarray(grafted["patch_embed"]["pos_embed"]),
        np.asarray(teacher_params["position_embeddings"]))
    np.testing.assert_array_equal(
        np.asarray(grafted["head"]["kernel"]),
        np.asarray(teacher_params["classifier"]["kernel"]))
    # conv bias NOT grafted (reference copies only .weight): the student's
    # original bias object is kept untouched
    assert grafted["patch_embed"]["proj_bias"] is \
        sv["params"]["patch_embed"]["proj_bias"]
    # grafted student still runs
    out = student.apply({"params": grafted}, x)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_orbax_teacher_checkpoint_roundtrip(tmp_path):
    """A teacher trained by cli/classification.py (orbax CheckpointManager
    layout) must load back through common.load_teacher /
    load_teacher_params for the distillation entry points."""
    import jax
    import jax.numpy as jnp
    from odevit_tpu.ckpt.checkpoint import CheckpointManager
    from odevit_tpu.teacher.convert import load_teacher_params
    from odevit_tpu.teacher.vit import ViTTeacher
    from odevit_tpu.train.state import (all_trainable, create_train_state,
                                        make_optimizer)

    teacher = ViTTeacher(image_size=16, patch_size=4, hidden_size=32,
                         num_layers=2, num_heads=2, mlp_dim=64,
                         num_classes=5)
    x = jnp.ones((1, 16, 16, 3))
    params = teacher.init(jax.random.PRNGKey(0), x)["params"]
    tx = make_optimizer(1e-4, trainable_mask=all_trainable(params))
    state = create_train_state(params, tx)

    ckpt = CheckpointManager(str(tmp_path), "teacher_rt", use_async=False)
    assert ckpt.save(state, metric=0.9)
    ckpt.wait()

    loaded = load_teacher_params(str(tmp_path / "teacher_rt"))
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
