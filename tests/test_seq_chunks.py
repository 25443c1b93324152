"""Sequence-chunked MMDiT block compute (seq_chunks > 1) parity.

The chunked path (models/mmdit/layers.py: _seq_chunked + QuantDense
col_slice) is the 768px/129f serving-memory lever: per-block temporaries
shrink to ~1/seq_chunks so the 76k-token forward fits beside the int8 11B
weights on a 16 GiB chip. These tests pin that the chunked compute is the
same function: identical param tree, outputs equal to the unchunked model
up to XLA reassociation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opensora_tpu.models.mmdit import layers as mmdit_layers
from opensora_tpu.models.mmdit.model import MMDiTConfig, MMDiTModel
from opensora_tpu.ops.quant import quantize_params


@pytest.fixture(autouse=True)
def _tiny_chunk_floor(monkeypatch):
    """Let tiny test sequences actually chunk (production floor is 2048
    tokens/chunk to bound per-chunk weight re-reads)."""
    monkeypatch.setattr(mmdit_layers, "_MIN_CHUNK_TOKENS", 1)

KW = dict(
    in_channels=8, vec_in_dim=8, context_in_dim=16, hidden_size=64,
    mlp_ratio=2.0, num_heads=2, depth=2, depth_single_blocks=2,
    axes_dim=[16, 8, 8], qkv_bias=True, guidance_embed=False,
    cond_embed=False, attn_backend="xla", dtype="fp32",
)


def _args(B=2, L=16, Lt=4):
    r = jax.random.split(jax.random.PRNGKey(7), 3)
    return (
        jax.random.normal(r[0], (B, L, 8)), jnp.zeros((B, L, 3)),
        jax.random.normal(r[1], (B, Lt, 16)), jnp.zeros((B, Lt, 3)),
        jnp.full((B,), 0.5), jax.random.normal(r[2], (B, 8)),
    )


@pytest.mark.parametrize("fused_qkv", [True, False])
def test_chunked_matches_unchunked_fp(fused_qkv):
    args = _args()
    base = MMDiTModel(MMDiTConfig(**KW, fused_qkv=fused_qkv))
    chunked = MMDiTModel(MMDiTConfig(**KW, fused_qkv=fused_qkv, seq_chunks=4))
    params = base.init(jax.random.PRNGKey(0), *args)["params"]
    # identical param tree: chunking is a compute schedule, not a model change
    p2 = chunked.init(jax.random.PRNGKey(0), *args)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    out1 = base.apply({"params": params}, *args)
    out2 = chunked.apply({"params": params}, *args)
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(out1), rtol=2e-5, atol=2e-5
    )


def test_chunked_matches_unchunked_w8a8():
    """Per-token activation quantization is chunk-invariant, so the chunked
    int8 path must agree with the unchunked int8 path tightly (NOT merely
    within int8-vs-fp error)."""
    args = _args()
    base_fp = MMDiTModel(MMDiTConfig(**KW))
    params = base_fp.init(jax.random.PRNGKey(0), *args)["params"]
    qparams = quantize_params(params)
    base = MMDiTModel(MMDiTConfig(**KW, quantized="w8a8"))
    chunked = MMDiTModel(MMDiTConfig(**KW, quantized="w8a8", seq_chunks=4))
    out1 = base.apply({"params": qparams}, *args)
    out2 = chunked.apply({"params": qparams}, *args)
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(out1), rtol=2e-4, atol=2e-4
    )


def test_chunked_nondividing_length_falls_back():
    """L that doesn't divide by seq_chunks uses the largest divisor (worst
    case 1 chunk) — never crashes, still correct."""
    args = _args(B=1, L=13, Lt=3)  # total 16 for single blocks; img L=13 prime
    base = MMDiTModel(MMDiTConfig(**KW))
    chunked = MMDiTModel(MMDiTConfig(**KW, seq_chunks=4))
    params = base.init(jax.random.PRNGKey(0), *args)["params"]
    out1 = base.apply({"params": params}, *args)
    out2 = chunked.apply({"params": params}, *args)
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(out1), rtol=2e-5, atol=2e-5
    )
