"""Head-network tests: MHA parity vs a torch replica of the reference
module (/root/reference/libs/nerfheads/networks/MultiHeadAttention.py:20-98)
and density-masking semantics (trainhead.py:133-137)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from gpnerf_tpu.models.attention import MultiHeadAttention
from gpnerf_tpu.models.heads import NeRFRGBHead, fused_mean_variance


class TMHA(nn.Module):
    """Torch oracle of the reference MHA (sum=False path)."""

    def __init__(self, n_head, d_model, d_k, d_v, kv_dim):
        super().__init__()
        self.n_head, self.d_k, self.d_v = n_head, d_k, d_v
        self.w_qs = nn.Linear(d_model, n_head * d_k, bias=False)
        self.w_ks = nn.Linear(kv_dim, n_head * d_k, bias=False)
        self.w_vs = nn.Linear(kv_dim, n_head * d_v, bias=False)
        self.fc = nn.Linear(n_head * d_v, d_model, bias=False)

    def forward(self, q, k, v):
        B, Lq, _ = q.shape
        Lk = k.size(1)
        qh = self.w_qs(q).view(B, Lq, self.n_head, self.d_k).transpose(1, 2)
        kh = self.w_ks(k).view(B, Lk, self.n_head, self.d_k).transpose(1, 2)
        vh = self.w_vs(v).view(B, Lk, self.n_head, self.d_v).transpose(1, 2)
        attn = torch.matmul(qh / self.d_k**0.5, kh.transpose(2, 3))
        attn = F.softmax(attn, dim=-1)
        out = torch.matmul(attn, vh).transpose(1, 2).reshape(B, Lq, -1)
        return self.fc(out)


def test_mha_matches_torch():
    rng = np.random.default_rng(0)
    code_dim, kv_dim, n_head = 16, 32, 4
    d = code_dim // n_head
    B, Lq, Lk = 50, 1, 3
    q = rng.standard_normal((B, Lq, code_dim)).astype(np.float32)
    kv = rng.standard_normal((B, Lk, kv_dim)).astype(np.float32)

    mha = MultiHeadAttention(
        n_head=n_head, d_model=code_dim, d_k=d, d_v=d, kv_dim=kv_dim,
        sum_residual=False,
    )
    variables = mha.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv))
    out, attn = mha.apply(variables, jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv))

    t = TMHA(n_head, code_dim, d, d, kv_dim)
    p = variables["params"]
    for name, lin in [("w_qs", t.w_qs), ("w_ks", t.w_ks), ("w_vs", t.w_vs), ("fc", t.fc)]:
        lin.weight.data = torch.from_numpy(np.asarray(p[name]["kernel"]).T.copy())
    with torch.no_grad():
        ref = t(torch.from_numpy(q), torch.from_numpy(kv), torch.from_numpy(kv)).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
    assert attn.shape == (B, n_head, Lq, Lk)


def test_fused_mean_variance():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 5, 3, 7)).astype(np.float32)
    mean, var = fused_mean_variance(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(mean)[:, :, 0], x.mean(axis=2), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(var)[:, :, 0], x.var(axis=2), rtol=1e-4, atol=1e-5
    )


def test_rgbhead_zeroes_sigma_without_valid_views():
    rng = np.random.default_rng(2)
    n_rays, n_samples, V, C = 6, 4, 3, 35
    rgb_feat = rng.standard_normal((n_rays, n_samples, V, C)).astype(np.float32)
    sigma_feat = rng.standard_normal((n_rays, n_samples, 64)).astype(np.float32)
    mask = np.ones((n_rays, n_samples, V, 1), np.float32)
    mask[0, 0] = 0.0  # first point sees no view

    head = NeRFRGBHead(in_feat_ch=32)
    variables = head.init(
        jax.random.PRNGKey(0),
        jnp.asarray(rgb_feat), jnp.asarray(sigma_feat), jnp.asarray(mask),
    )
    rgb_in, rgb, sigma = head.apply(
        variables, jnp.asarray(rgb_feat), jnp.asarray(sigma_feat), jnp.asarray(mask)
    )
    sigma = np.asarray(sigma)
    assert sigma.shape == (n_rays, n_samples, 1)
    assert sigma[0, 0, 0] == 0.0
    assert np.all(sigma >= 0)  # ReLU output head
    rgb = np.asarray(rgb)
    assert rgb.shape == (n_rays, n_samples, 3)
    assert np.all((rgb >= 0) & (rgb <= 1))
    np.testing.assert_array_equal(np.asarray(rgb_in), rgb_feat[..., :3])
