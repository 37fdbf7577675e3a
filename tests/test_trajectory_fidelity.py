"""North-star check: trajectory fidelity vs an independent torch oracle.

BASELINE.md demands ">= 1e-4-level trajectory fidelity" against the
reference semantics. torchdiffeq isn't installed here, so the oracle is a
torch re-statement of the documented model math (CenterNorm -> fused-QKV
softmax attention + bias-free GELU MLP -> drift scaling) stepped with the
same fixed-grid Euler / 3/8-RK4 tableaus, loaded with OUR weights via the
inverse of the converter mapping. Every grid-point state of the [T,B,N,D]
trajectory must match to ~1e-5 in f32.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from odevit_tpu.models.vit_ode import ViTODE


class TorchOracle:
    """Independent torch implementation of the ViTODE forward."""

    def __init__(self, params, num_heads, emulate_depth, time_interval):
        g = lambda *k: torch.tensor(np.asarray(_dig(params, k)))
        self.w_qkv = g("vf", "attn", "qkv_kernel")        # [D, 3D]
        self.w_out = g("vf", "attn", "out_kernel")
        self.w1 = g("vf", "mlp", "fc1_kernel")
        self.w2 = g("vf", "mlp", "fc2_kernel")
        self.cna_s = g("vf", "norm_attn", "scale")
        self.cna_b = g("vf", "norm_attn", "bias")
        self.cnm_s = g("vf", "norm_mlp", "scale")
        self.cnm_b = g("vf", "norm_mlp", "bias")
        self.pk = g("patch_embed", "proj_kernel")         # [C*p*p, D]
        self.pb = g("patch_embed", "proj_bias")
        self.cls = g("patch_embed", "cls_token")
        self.reg = g("patch_embed", "register_tokens")
        self.pos = g("patch_embed", "pos_embed")
        self.head_k = g("head", "kernel")
        self.head_b = g("head", "bias")
        self.num_heads = num_heads
        self.d = self.w_out.shape[0]
        self.scaler = float(emulate_depth) if time_interval == 1.0 else 1.0

    def center_norm(self, x, scale, bias):
        d = x.shape[-1]
        u = x.mean(-1, keepdim=True)
        return (d / (d - 1.0)) * (x - u) * scale + bias

    def vf(self, x):
        b, n, d = x.shape
        h, hd = self.num_heads, d // self.num_heads
        xa = self.center_norm(x, self.cna_s, self.cna_b)
        xm = self.center_norm(x, self.cnm_s, self.cnm_b)

        qkv = xa @ self.w_qkv
        q, k, v = qkv.chunk(3, dim=-1)
        sh = lambda t: t.view(b, n, h, hd).transpose(1, 2)
        attn = torch.softmax(sh(q) @ sh(k).transpose(-2, -1) * hd ** -0.5,
                             dim=-1)
        g = (attn @ sh(v)).transpose(1, 2).reshape(b, n, d) @ self.w_out
        f = torch.nn.functional.gelu(xm @ self.w1) @ self.w2
        return (f + g) * self.scaler

    def embed(self, images_nhwc):
        b, hh, ww, c = images_nhwc.shape
        p = int((self.pk.shape[0] // c) ** 0.5)
        x = images_nhwc.reshape(b, hh // p, p, ww // p, p, c)
        x = x.permute(0, 1, 3, 5, 2, 4).reshape(b, -1, c * p * p)
        tokens = x @ self.pk + self.pb
        parts = [self.cls.expand(b, -1, -1), tokens,
                 self.reg.unsqueeze(0).expand(b, -1, -1)]
        x = torch.cat(parts, dim=1)
        npos = self.pos.shape[1]
        x[:, :npos] = x[:, :npos] + self.pos
        return x

    def integrate(self, y0, ts, method):
        states = [y0]
        y = y0
        for i in range(len(ts) - 1):
            dt = float(ts[i + 1] - ts[i])
            if method == "euler":
                y = y + dt * self.vf(y)
            elif method == "rk4":                 # Kutta 3/8 rule
                k1 = self.vf(y)
                k2 = self.vf(y + dt * k1 / 3.0)
                k3 = self.vf(y + dt * (k2 - k1 / 3.0))
                k4 = self.vf(y + dt * (k1 - k2 + k3))
                y = y + dt * (k1 + 3.0 * (k2 + k3) + k4) / 8.0
            else:
                raise ValueError(method)
            states.append(y)
        return torch.stack(states)


def _dig(tree, keys):
    for k in keys:
        tree = tree[k]
    return tree


@pytest.mark.parametrize("solver", ["euler", "rk4"])
def test_trajectory_fidelity_vs_torch_oracle(solver):
    m = ViTODE(img_size=16, patch_size=4, embed_dim=48, num_heads=4,
               mlp_ratio=2.0, num_classes=7, emulate_depth=12.0,
               time_interval=1.0, num_eval_steps=13, solver=solver,
               register_tokens=3, pos_embed_register_tokens=False)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))

    out = m.apply(v, jnp.asarray(x), output_hidden_states=True)
    ours = np.asarray(out["states"])                  # [T, B, N, D]
    our_logits = np.asarray(out["logits"])

    oracle = TorchOracle(v["params"], num_heads=4, emulate_depth=12.0,
                         time_interval=1.0)
    with torch.no_grad():
        y0 = oracle.embed(torch.tensor(x))
        ts = np.linspace(0.0, 1.0, 13)
        want = oracle.integrate(y0, ts, solver).numpy()
        want_logits = (torch.tensor(ours[-1][:, 0]) @ oracle.head_k
                       + oracle.head_b).numpy()

    scale = np.abs(want).max()
    err = np.abs(ours - want).max() / scale
    assert err < 1e-4, f"relative trajectory error {err:.2e} (>= 1e-4)"
    np.testing.assert_allclose(our_logits, want_logits, atol=1e-4,
                               rtol=1e-4)


def test_fidelity_metric_reported():
    """The same fidelity number the benchmark harness reports."""
    from benchmarks.fidelity import trajectory_fidelity
    report = trajectory_fidelity(solver="rk4", num_eval_steps=9)
    assert report["relative_error"] < 1e-4
