"""Multi-head attention for SMPL vertex-code / image-feature fusion.

Twin of /root/reference/libs/nerfheads/networks/MultiHeadAttention.py:20-98:
scaled dot-product MHA with separate kv_dim, bias-free projections, and an
optional residual+LayerNorm gated by `sum_residual` (GP-NeRF uses
sum=False, so the LayerNorm parameters exist but are unused — kept for
checkpoint-key parity). Dropout is constructed but never applied in the
reference (ScaledDotProductAttention stores but does not use attn_dropout).

GP-NeRF's usage is 6,890 independent 1-query x 3-key attentions
(trainhead.py:48-52): q (S, 1, d_model), k/v (S, V, kv_dim).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class MultiHeadAttention(nn.Module):
    n_head: int
    d_model: int
    d_k: int
    d_v: int
    kv_dim: int | None = None
    sum_residual: bool = True

    @nn.compact
    def __call__(self, q, k, v):
        """q: (B, Lq, d_model); k, v: (B, Lk, kv_dim). Returns
        ((B, Lq, d_model), attn (B, n_head, Lq, Lk))."""
        n_head, d_k, d_v = self.n_head, self.d_k, self.d_v
        B, Lq, _ = q.shape
        Lk = k.shape[1]
        residual = q

        dense = lambda f, name: nn.Dense(f, use_bias=False, name=name)
        qh = dense(n_head * d_k, "w_qs")(q).reshape(B, Lq, n_head, d_k)
        kh = dense(n_head * d_k, "w_ks")(k).reshape(B, Lk, n_head, d_k)
        vh = dense(n_head * d_v, "w_vs")(v).reshape(B, Lk, n_head, d_v)

        temperature = d_k**0.5
        attn = jnp.einsum("bqhd,bkhd->bhqk", qh / temperature, kh)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(B, Lq, n_head * d_v)
        out = dense(self.d_model, "fc")(out)

        # LayerNorm params exist in the reference checkpoint even when unused
        # (sum=False) — instantiate them either way for checkpoint-key parity
        ln = nn.LayerNorm(epsilon=1e-6, name="layer_norm")
        if self.sum_residual:
            out = ln(out + residual)
        else:
            _ = ln(jnp.zeros((1, self.d_model)))
        return out, attn
