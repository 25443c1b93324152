"""MMDiT building blocks (flax.linen).

Behavioral reference: opensora/models/mmdit/layers.py:31-403 — EmbedND /
timestep_embedding / MLPEmbedder / RMSNorm / QKNorm / SelfAttention /
Modulation / DoubleStreamBlock / SingleStreamBlock / LastLayer. Re-designed
for TPU: RoPE tables are cos/sin (split rotate-half layout by default, see
opensora_tpu/ops/rope.py), attention is the Pallas flash kernel, norms are
XLA-fused plain JAX (no liger/apex equivalents needed).

Weight-shape convention: flax Dense kernels are (in, out) = transposed torch
nn.Linear weights; the checkpoint loader handles the transpose.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from opensora_tpu.ops.attention import attention
from opensora_tpu.ops.norms import layer_norm, rms_norm
from opensora_tpu.ops.quant import dense
from opensora_tpu.ops.rope import embed_nd


def timestep_embedding(
    t: jnp.ndarray, dim: int, max_period: float = 10000.0, time_factor: float = 1000.0
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (reference layers.py:68-93), fp32."""
    t = time_factor * t.astype(jnp.float32)
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class EmbedND(nn.Module):
    """Multi-axis RoPE table builder (reference layers.py:31-46)."""

    axes_dim: Sequence[int]
    theta: float = 10000.0

    def __call__(self, ids: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return embed_nd(ids, self.axes_dim, self.theta)


class MLPEmbedder(nn.Module):
    hidden_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(
            self.hidden_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="in_layer",
        )(x)
        x = nn.silu(x)
        return nn.Dense(
            self.hidden_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="out_layer",
        )(x)


class RMSNorm(nn.Module):
    dim: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.dim,), self.param_dtype)
        return rms_norm(x, scale)


class QKNorm(nn.Module):
    """Per-head RMSNorm on q and k (reference layers.py:126-137)."""

    head_dim: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q: jnp.ndarray, k: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        q = RMSNorm(self.head_dim, self.param_dtype, name="query_norm")(q)
        k = RMSNorm(self.head_dim, self.param_dtype, name="key_norm")(k)
        return q, k


class Modulation(nn.Module):
    """AdaLN modulation: vec → (shift, scale, gate) × (1 or 2)."""

    dim: int
    double: bool
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    quantized: "bool | str" = False

    @nn.compact
    def __call__(self, vec: jnp.ndarray):
        mult = 6 if self.double else 3
        out = dense(
            self.quantized, mult * self.dim,
            dtype=self.dtype, param_dtype=self.param_dtype, name="lin",
        )(nn.silu(vec))
        out = out[:, None, :]
        chunks = jnp.split(out, mult, axis=-1)
        first = tuple(chunks[:3])
        second = tuple(chunks[3:]) if self.double else None
        return first, second  # each: (shift, scale, gate)


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads)


def _largest_divisor(n: int, cap: int) -> int:
    for c in range(min(cap, n), 0, -1):
        if n % c == 0:
            return c
    return 1


# Streams shorter than this per chunk aren't worth chunking: every chunk
# re-reads the MLP weights from HBM, so e.g. splitting the 512-token txt
# stream 16 ways would cost 16x weight traffic to save a few MB of
# activations. (Tests monkeypatch this to 1 to exercise chunking at tiny
# geometry.)
_MIN_CHUNK_TOKENS = 2048


def _seq_chunked(mdl: nn.Module, fn, n_chunks: int, *seqs: jnp.ndarray):
    """Apply ``fn(mdl, *token_chunks)`` over the sequence axis in
    ``n_chunks`` pieces via ``nn.scan`` and re-assemble.

    The scan sequences the chunks, so XLA's peak live set for everything
    inside ``fn`` is one chunk — this is the serving-memory lever that fits
    the 768px/129f sequence (76k tokens, 3.07 GiB for a single fused-mlp
    projection output) next to the 11.2 GiB int8 11B weights on one 16 GiB
    chip. ``fn`` may close over per-batch (B, 1, D) modulation tensors; all
    ``seqs`` must share (B, L) leading shape. Falls back to a direct call
    when the sequence doesn't split.
    """
    B, L = seqs[0].shape[0], seqs[0].shape[1]
    n = _largest_divisor(L, min(n_chunks, max(1, L // _MIN_CHUNK_TOKENS)))
    if n <= 1:
        return fn(mdl, *seqs)
    split = tuple(
        s.reshape(B, n, L // n, s.shape[-1]).transpose(1, 0, 2, 3) for s in seqs
    )

    def body(m, carry, xs):
        return carry, fn(m, *xs)

    _, out = nn.scan(
        body, variable_broadcast="params", split_rngs={"params": False},
        in_axes=0, out_axes=0,
    )(mdl, None, split)
    return out.transpose(1, 0, 2, 3).reshape(B, L, out.shape[-1])


class SelfAttention(nn.Module):
    """QKV projection + QKNorm + output projection.

    Used standalone nowhere (matching the reference, where the block
    processors drive it); exposes qkv/norm/proj submodules for the blocks.
    """

    dim: int
    num_heads: int
    qkv_bias: bool = False
    fused_qkv: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    quantized: "bool | str" = False

    def setup(self):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.fused_qkv:
            self.qkv = dense(
                self.quantized, self.dim * 3, use_bias=self.qkv_bias, **common
            )
        else:
            self.q_proj = dense(
                self.quantized, self.dim, use_bias=self.qkv_bias, **common
            )
            self.k_proj = dense(
                self.quantized, self.dim, use_bias=self.qkv_bias, **common
            )
            self.v_proj = dense(
                self.quantized, self.dim, use_bias=self.qkv_bias, **common
            )
        self.norm = QKNorm(self.dim // self.num_heads, self.param_dtype)
        self.proj = dense(self.quantized, self.dim, **common)

    def qkv_heads(self, x: jnp.ndarray, split_compute: bool = False):
        """Project to per-head q, k, v of shape (B, L, H, D).

        ``split_compute`` computes a fused qkv kernel as three column-sliced
        matmuls so the (B, L, 3·dim) buffer never materializes (long-sequence
        serving; see _seq_chunked)."""
        if self.fused_qkv:
            if split_compute:
                d = self.dim
                q = self.qkv(x, col_slice=(0, d))
                k = self.qkv(x, col_slice=(d, 2 * d))
                v = self.qkv(x, col_slice=(2 * d, 3 * d))
            else:
                qkv = self.qkv(x)
                q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q, k, v = self.q_proj(x), self.k_proj(x), self.v_proj(x)
        q = _split_heads(q, self.num_heads)
        k = _split_heads(k, self.num_heads)
        v = _split_heads(v, self.num_heads)
        q, k = self.norm(q, k)
        q = q.astype(v.dtype)
        k = k.astype(v.dtype)
        return q, k, v

    def __call__(self, x: jnp.ndarray, pe, **attn_kwargs) -> jnp.ndarray:
        q, k, v = self.qkv_heads(x)
        out = attention(q, k, v, pe=pe, **attn_kwargs)
        return self.proj(out)


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    quantized: "bool | str" = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = dense(self.quantized, self.hidden_dim, **common, name="0")(x)
        x = nn.gelu(x, approximate=True)
        return dense(self.quantized, self.out_dim, **common, name="2")(x)


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return (1 + scale) * x + shift


class DoubleStreamBlock(nn.Module):
    """Dual-stream MMDiT block (reference layers.py:196-313).

    img and txt streams each get their own modulation/attention/MLP; the
    attention itself is joint over the concatenated [txt, img] sequence.
    """

    hidden_size: int
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool = False
    fused_qkv: bool = True
    rope_convention: str = "split"
    attn_backend: Optional[str] = None
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    quantized: "bool | str" = False
    # >1: column-sliced qkv + _seq_chunked MLP tail (long-sequence serving)
    seq_chunks: int = 1

    def setup(self):
        common = dict(
            dtype=self.dtype, param_dtype=self.param_dtype, quantized=self.quantized
        )
        mlp_hidden = int(self.hidden_size * self.mlp_ratio)
        self.img_mod = Modulation(self.hidden_size, double=True, **common)
        self.txt_mod = Modulation(self.hidden_size, double=True, **common)
        self.img_attn = SelfAttention(
            self.hidden_size, self.num_heads, self.qkv_bias, self.fused_qkv, **common
        )
        self.txt_attn = SelfAttention(
            self.hidden_size, self.num_heads, self.qkv_bias, self.fused_qkv, **common
        )
        self.img_mlp = Mlp(mlp_hidden, self.hidden_size, **common)
        self.txt_mlp = Mlp(mlp_hidden, self.hidden_size, **common)

    def __call__(self, img, txt, vec, pe):
        (img_shift1, img_scale1, img_gate1), (img_shift2, img_scale2, img_gate2) = (
            self.img_mod(vec)
        )
        (txt_shift1, txt_scale1, txt_gate1), (txt_shift2, txt_scale2, txt_gate2) = (
            self.txt_mod(vec)
        )

        # per-stream gating: column-slicing a fused qkv re-reads the kernel
        # (and re-quantizes the activation in w8a8) 3x — only worth it when
        # the stream is long enough that the fused output buffer matters.
        # The 512-token txt stream's ~9 MiB qkv never qualifies.
        split_img = self.seq_chunks > 1 and img.shape[1] >= _MIN_CHUNK_TOKENS
        split_txt = self.seq_chunks > 1 and txt.shape[1] >= _MIN_CHUNK_TOKENS
        img_mod = modulate(layer_norm(img), img_shift1, img_scale1)
        txt_mod = modulate(layer_norm(txt), txt_shift1, txt_scale1)

        img_q, img_k, img_v = self.img_attn.qkv_heads(img_mod, split_compute=split_img)
        txt_q, txt_k, txt_v = self.txt_attn.qkv_heads(txt_mod, split_compute=split_txt)

        # joint attention over [txt, img]
        q = jnp.concatenate([txt_q, img_q], axis=1)
        k = jnp.concatenate([txt_k, img_k], axis=1)
        v = jnp.concatenate([txt_v, img_v], axis=1)
        attn_out = attention(
            q, k, v, pe=pe,
            rope_convention=self.rope_convention, backend=self.attn_backend,
        )
        txt_len = txt_q.shape[1]
        txt_attn, img_attn = attn_out[:, :txt_len], attn_out[:, txt_len:]

        img = img + img_gate1 * self.img_attn.proj(img_attn)
        txt = txt + txt_gate1 * self.txt_attn.proj(txt_attn)
        if self.seq_chunks > 1:
            # one MLP chunk (plus its gelu buffer) live at a time; the
            # modulate/layer_norm recompute per chunk is VPU noise
            # (_seq_chunked itself falls back for streams under the floor)
            img = img + img_gate2 * _seq_chunked(
                self,
                lambda m, x_c: m.img_mlp(modulate(layer_norm(x_c), img_shift2, img_scale2)),
                self.seq_chunks, img,
            )
            txt = txt + txt_gate2 * _seq_chunked(
                self,
                lambda m, x_c: m.txt_mlp(modulate(layer_norm(x_c), txt_shift2, txt_scale2)),
                self.seq_chunks, txt,
            )
        else:
            img = img + img_gate2 * self.img_mlp(
                modulate(layer_norm(img), img_shift2, img_scale2)
            )
            txt = txt + txt_gate2 * self.txt_mlp(
                modulate(layer_norm(txt), txt_shift2, txt_scale2)
            )
        return img, txt


class SingleStreamBlock(nn.Module):
    """Single-stream parallel attn+MLP block, ViT-22B style
    (reference layers.py:316-379)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    fused_qkv: bool = True
    rope_convention: str = "split"
    attn_backend: Optional[str] = None
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    quantized: "bool | str" = False
    # >1: column-sliced qkv + _seq_chunked MLP tail (long-sequence serving)
    seq_chunks: int = 1

    def setup(self):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        q = self.quantized
        self.mlp_hidden_dim = int(self.hidden_size * self.mlp_ratio)
        if self.fused_qkv:
            self.linear1 = dense(
                q, self.hidden_size * 3 + self.mlp_hidden_dim, **common
            )
        else:
            self.q_proj = dense(q, self.hidden_size, **common)
            self.k_proj = dense(q, self.hidden_size, **common)
            self.v_mlp = dense(q, self.hidden_size + self.mlp_hidden_dim, **common)
        self.linear2 = dense(q, self.hidden_size, **common)
        self.norm = QKNorm(self.hidden_size // self.num_heads, self.param_dtype)
        self.modulation = Modulation(self.hidden_size, double=False, quantized=q, **common)

    def __call__(self, x, vec, pe):
        (shift, scale, gate), _ = self.modulation(vec)
        h = self.hidden_size
        chunked = self.seq_chunks > 1 and x.shape[1] >= _MIN_CHUNK_TOKENS
        x_mod = modulate(layer_norm(x), shift, scale)
        mlp = None
        if chunked:
            # column-sliced projections: neither the (B, L, 3h + mlp_hidden)
            # fused output nor the (B, L, mlp_hidden) part exists full-length
            if self.fused_qkv:
                q = self.linear1(x_mod, col_slice=(0, h))
                k = self.linear1(x_mod, col_slice=(h, 2 * h))
                v = self.linear1(x_mod, col_slice=(2 * h, 3 * h))
            else:
                q = self.q_proj(x_mod)
                k = self.k_proj(x_mod)
                v = self.v_mlp(x_mod, col_slice=(0, h))
        elif self.fused_qkv:
            proj = self.linear1(x_mod)
            qkv, mlp = jnp.split(proj, [3 * h], axis=-1)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = self.q_proj(x_mod)
            k = self.k_proj(x_mod)
            v_mlp = self.v_mlp(x_mod)
            v, mlp = jnp.split(v_mlp, [h], axis=-1)
        q = _split_heads(q, self.num_heads)
        k = _split_heads(k, self.num_heads)
        v = _split_heads(v, self.num_heads)
        q, k = self.norm(q, k)
        q = q.astype(v.dtype)
        k = k.astype(v.dtype)

        attn_out = attention(
            q, k, v, pe=pe,
            rope_convention=self.rope_convention, backend=self.attn_backend,
        )
        if chunked:
            # recompute the modulated input per chunk (frees the full x_mod
            # before attention) and run the MLP tail one chunk at a time
            def tail(m, x_c, attn_c):
                xm_c = modulate(layer_norm(x_c), shift, scale)
                if m.fused_qkv:
                    mlp_c = m.linear1(
                        xm_c, col_slice=(3 * h, 3 * h + m.mlp_hidden_dim)
                    )
                else:
                    mlp_c = m.v_mlp(xm_c, col_slice=(h, h + m.mlp_hidden_dim))
                return m.linear2(
                    jnp.concatenate(
                        [attn_c, nn.gelu(mlp_c, approximate=True)], axis=-1
                    )
                )

            out = _seq_chunked(self, tail, self.seq_chunks, x, attn_out)
        else:
            out = self.linear2(
                jnp.concatenate([attn_out, nn.gelu(mlp, approximate=True)], axis=-1)
            )
        return x + gate * out


class LastLayer(nn.Module):
    """AdaLN final projection (reference layers.py:382-403)."""

    out_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
        mod = nn.Dense(
            2 * x.shape[-1], dtype=self.dtype, param_dtype=self.param_dtype,
            name="adaLN_modulation",
        )(nn.silu(vec))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = (1 + scale[:, None, :]) * layer_norm(x) + shift[:, None, :]
        return nn.Dense(
            self.out_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="linear",
        )(x)
