"""Golden-value tests for core ops against torch implementations.

The torch sides are independent re-statements of the documented math
(CenterNorm, L2 attention, bias-free MLP) or direct library calls
(nn.MultiheadAttention), used purely as numerical oracles.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from odevit_tpu.ops.center_norm import CenterNorm
from odevit_tpu.ops.attention import SoftmaxSelfAttention, L2SelfAttention
from odevit_tpu.ops.mlp import Mlp
from odevit_tpu.ops.patch_embed import PatchEmbed, patchify, nchw_to_nhwc
from odevit_tpu.ops.init import spectral_xavier_normal


def test_center_norm_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 16)).astype(np.float32)
    w = rng.standard_normal(16).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)

    mod = CenterNorm(features=16)
    params = {"params": {"scale": jnp.array(w), "bias": jnp.array(b)}}
    got = np.asarray(mod.apply(params, jnp.array(x)))

    xt = torch.tensor(x)
    scale = 16 / 15.0
    u = xt.mean(-1, keepdim=True)
    want = (torch.tensor(w) * (scale * (xt - u)) + torch.tensor(b)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_softmax_attention_matches_torch_mha():
    torch.manual_seed(0)
    dim, heads, b, n = 32, 4, 2, 9
    mha = torch.nn.MultiheadAttention(dim, heads, bias=False, batch_first=True)
    x = torch.randn(b, n, dim)
    with torch.no_grad():
        out_t, attn_t = mha(x, x, x, need_weights=True,
                            average_attn_weights=False)

    # Map torch in_proj_weight [3D, D] / out_proj [D, D] to our kernels.
    w_qkv = mha.in_proj_weight.detach().numpy().T       # [D, 3D]
    w_out = mha.out_proj.weight.detach().numpy().T      # [D, D]
    mod = SoftmaxSelfAttention(dim=dim, num_heads=heads, spectral_init=False)
    params = {"params": {"qkv_kernel": jnp.array(w_qkv),
                         "out_kernel": jnp.array(w_out)}}
    out_j, attn_j = mod.apply(params, jnp.array(x.numpy()))

    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(attn_j), attn_t.numpy(),
                               atol=2e-5, rtol=2e-5)


def test_l2_attention_matches_reference_math():
    rng = np.random.default_rng(1)
    dim, heads, b, n = 16, 2, 2, 7
    x = rng.standard_normal((b, n, dim)).astype(np.float32)

    mod = L2SelfAttention(dim=dim, num_heads=heads, spectral_init=False)
    variables = mod.init(jax.random.PRNGKey(0), jnp.array(x))
    out_j, attn_j = mod.apply(variables, jnp.array(x))
    p = variables["params"]

    # Torch oracle of the documented math.
    def lin(y, k, bias):
        return y @ torch.tensor(np.asarray(k)) + torch.tensor(np.asarray(bias))

    xt = torch.tensor(x)
    hd = dim // heads
    q = lin(xt, p["q_kernel"], p["q_bias"]).view(b, n, heads, hd).transpose(1, 2)
    k = lin(xt, p["k_kernel"], p["k_bias"]).view(b, n, heads, hd).transpose(1, 2)
    v = lin(xt, p["v_kernel"], p["v_bias"]).view(b, n, heads, hd).transpose(1, 2)
    d2 = (q ** 2).sum(-1, keepdim=True) + (k ** 2).sum(-1).unsqueeze(-2) \
        - 2 * q @ k.transpose(-2, -1)
    attn = torch.exp(-d2 * hd ** -0.5)
    attn = attn / (attn.sum(-1, keepdim=True) + 1e-8)
    out = (attn @ v).transpose(1, 2).reshape(b, n, dim)
    out = lin(out, p["out_kernel"], p["out_bias"])

    np.testing.assert_allclose(np.asarray(attn_j), attn.numpy(),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out_j), out.numpy(),
                               atol=2e-5, rtol=2e-5)
    # rows sum to one
    np.testing.assert_allclose(np.asarray(attn_j).sum(-1),
                               np.ones((b, heads, n)), atol=1e-5)


def test_mlp_matches_torch():
    rng = np.random.default_rng(2)
    dim, hidden = 8, 32
    x = rng.standard_normal((3, 5, dim)).astype(np.float32)
    w1 = rng.standard_normal((dim, hidden)).astype(np.float32)
    w2 = rng.standard_normal((hidden, dim)).astype(np.float32)

    mod = Mlp(dim=dim, hidden_dim=hidden, spectral_init=False)
    params = {"params": {"fc1_kernel": jnp.array(w1), "fc2_kernel": jnp.array(w2)}}
    got = np.asarray(mod.apply(params, jnp.array(x)))

    want = torch.nn.functional.gelu(
        torch.tensor(x) @ torch.tensor(w1)) @ torch.tensor(w2)
    np.testing.assert_allclose(got, want.numpy(), atol=2e-5, rtol=2e-5)


def test_patchify_matches_torch_conv():
    torch.manual_seed(3)
    b, c, hw, p, d = 2, 3, 8, 4, 6
    conv = torch.nn.Conv2d(c, d, kernel_size=p, stride=p)
    x = torch.randn(b, c, hw, hw)
    with torch.no_grad():
        want = conv(x).flatten(2).transpose(1, 2).numpy()   # [B, N, D]

    kernel = conv.weight.detach().numpy().reshape(d, -1).T  # [C*p*p, D]
    patches = patchify(nchw_to_nhwc(jnp.array(x.numpy())), p)
    got = np.asarray(patches @ kernel + conv.bias.detach().numpy())
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("reg_pos", [True, False])
def test_patch_embed_shapes_and_pos_branch(reg_pos):
    mod = PatchEmbed(img_size=32, patch_size=4, embed_dim=64,
                     register_tokens=4, pos_embed_register_tokens=reg_pos,
                     spectral_init=False)
    x = jnp.ones((2, 32, 32, 3))
    variables = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(variables, x)
    assert out.shape == (2, 1 + 64 + 4, 64)
    pos = variables["params"]["pos_embed"]
    assert pos.shape[1] == (69 if reg_pos else 65)


def test_spectral_init_sigma1_is_one():
    init = spectral_xavier_normal()
    w = init(jax.random.PRNGKey(0), (64, 128))
    s = np.linalg.svd(np.asarray(w), compute_uv=False)
    np.testing.assert_allclose(s[0], 1.0, atol=1e-5)

    wc = init(jax.random.PRNGKey(1), (4, 4, 3, 16))  # conv kernel
    mat = np.moveaxis(np.asarray(wc), -1, 0).reshape(16, -1)
    s = np.linalg.svd(mat, compute_uv=False)
    np.testing.assert_allclose(s[0], 1.0, atol=1e-5)
