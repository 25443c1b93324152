"""Real-checkpoint verification harness (run the moment published weights
are on disk — the round-3 parity gate).

    python scripts/cnv/verify_pretrained.py mmdit  Open_Sora_v2.safetensors
    python scripts/cnv/verify_pretrained.py vae    hunyuan_vae.safetensors
    python scripts/cnv/verify_pretrained.py mmdit  ckpt.safetensors \
        --ref-npz reference_io.npz          # fixed-input parity vs torch

Per kind it (1) loads + converts the torch-layout checkpoint (both RoPE
conventions for the MMDiT), (2) checks the converted tree against the
model's eval_shape structure, (3) runs a small deterministic forward and
prints output statistics, (4) cross-checks the two RoPE conventions agree,
and (5) if ``--ref-npz`` provides {inputs..., expected} captured from the
torch reference, asserts fp32-tolerance parity (the SURVEY north star).

Reference layout: opensora/utils/ckpt.py:84-140; model geometry
configs/diffusion/inference/256px.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def _stats(name, arr):
    a = np.asarray(arr, np.float32)
    return {
        "tensor": name,
        "shape": list(a.shape),
        "mean": float(a.mean()),
        "std": float(a.std()),
        "absmax": float(np.abs(a).max()),
        "finite": bool(np.isfinite(a).all()),
    }


def mmdit_fixture_inputs(in_ch: int, ctx: int, vec: int, cond: bool,
                         guid: bool, t: int = 3, h: int = 8, w: int = 12,
                         lt: int = 8, seed: int = 0):
    """The deterministic forward inputs used by verify_mmdit — exposed so a
    torch-side oracle can capture ``expected`` on the SAME inputs (numpy
    tuple ordered like MMDiTModel.__call__; None where a head is absent)."""
    from opensora_tpu.utils.sampling import build_img_ids

    B = 1
    L = t * (h // 2) * (w // 2)
    rng = np.random.default_rng(seed)
    return (
        rng.normal(size=(B, L, in_ch)).astype(np.float32),
        np.asarray(build_img_ids(t, h, w, 2, B), np.float32),
        rng.normal(size=(B, lt, ctx)).astype(np.float32),
        np.zeros((B, lt, 3), np.float32),
        np.full((B,), 0.4, np.float32),
        rng.normal(size=(B, vec)).astype(np.float32),
        rng.normal(size=(B, L, in_ch + 4)).astype(np.float32) if cond else None,
        np.full((B,), 4.0, np.float32) if guid else None,
    )


def verify_mmdit(path: str, ref_npz: str | None,
                 src_rope: str = "split") -> dict:
    """``src_rope``: RoPE pairing the checkpoint was trained with —
    "split" for the published Open-Sora-v2 weights (use_liger_rope=True,
    reference configs/diffusion/inference/256px.py:41), "interleaved" for
    original Flux dumps."""
    import jax
    import jax.numpy as jnp

    from opensora_tpu.models.mmdit.model import MMDiTConfig, MMDiTModel
    from opensora_tpu.utils.ckpt import convert_mmdit_state_dict, load_torch_state_dict

    sd = load_torch_state_dict(path)
    depth = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("double_blocks.")
    )
    depth_s = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("single_blocks.")
    )
    hidden = sd["img_in.weight"].shape[0]
    in_ch = sd["img_in.weight"].shape[1]
    ctx = sd["txt_in.weight"].shape[1]
    vec = sd["vector_in.in_layer.weight"].shape[1]
    cond = "cond_in.weight" in sd
    guid = "guidance_in.in_layer.weight" in sd
    mlp_ratio = sd["double_blocks.0.img_mlp.0.weight"].shape[0] / hidden
    head_dim = sd["double_blocks.0.img_attn.norm.query_norm.scale"].shape[0]
    heads = hidden // head_dim
    # the published checkpoints use the UNFUSED projection layout
    # (fused_qkv=False in the shipping configs); detect rather than assume
    src_fused = "double_blocks.0.img_attn.qkv.weight" in sd
    qkv_key = "qkv" if src_fused else "q_proj"
    qkv_bias = f"double_blocks.0.img_attn.{qkv_key}.bias" in sd
    report = {
        "kind": "mmdit", "depth": depth, "depth_single": depth_s,
        "hidden": hidden, "heads": heads, "cond_embed": cond,
        "guidance_embed": guid, "n_tensors": len(sd),
        "fused_qkv_src": src_fused, "src_rope_convention": src_rope,
    }

    args = tuple(
        jnp.asarray(a) if a is not None else None
        for a in mmdit_fixture_inputs(in_ch, ctx, vec, cond, guid)
    )

    outs = {}
    for conv in ("interleaved", "split"):
        params = convert_mmdit_state_dict(
            sd, depth=depth, depth_single=depth_s, num_heads=heads,
            head_dim=head_dim, rope_convention=conv,
            cond_embed=cond, guidance_embed=guid,
            fused_qkv=True, src_rope_convention=src_rope,
        )
        cfg = MMDiTConfig(
            in_channels=in_ch, vec_in_dim=vec, context_in_dim=ctx,
            hidden_size=hidden, mlp_ratio=mlp_ratio, num_heads=heads,
            depth=depth, depth_single_blocks=depth_s,
            axes_dim=[16, 56, 56] if head_dim == 128 else
            [head_dim // 4, 3 * head_dim // 8, 3 * head_dim // 8],
            qkv_bias=qkv_bias, guidance_embed=guid, cond_embed=cond,
            rope_convention=conv, attn_backend="xla", dtype="fp32",
        )
        model = MMDiTModel(cfg)
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *args)["params"]
        got = {
            jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
        }
        want = {
            jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_flatten_with_path(shapes)[0]
        }
        missing = sorted(set(want) - set(got))[:5]
        extra = sorted(set(got) - set(want))[:5]
        assert not missing and not extra, (missing, extra)
        mismatched = [k for k in want if tuple(got[k]) != tuple(want[k])][:5]
        assert not mismatched, mismatched
        params = jax.tree.map(lambda x: np.asarray(x, np.float32), params)
        outs[conv] = np.asarray(model.apply({"params": params}, *args))
    report["fwd"] = _stats("mmdit_out", outs["split"])
    delta = float(np.abs(outs["split"] - outs["interleaved"]).max())
    report["rope_convention_max_delta"] = delta
    assert delta < 1e-3, f"RoPE conventions disagree: {delta}"

    if ref_npz:
        ref = np.load(ref_npz)
        np.testing.assert_allclose(
            outs["interleaved"], ref["expected"], atol=2e-3, rtol=2e-3
        )
        report["ref_parity"] = "PASS"
    return report


def verify_vae(path: str, ref_npz: str | None) -> dict:
    import jax
    import jax.numpy as jnp

    from opensora_tpu.models.hunyuan_vae.model import (
        AutoEncoder3DConfig, AutoencoderKLCausal3D,
    )
    from opensora_tpu.utils.ckpt import convert_hunyuan_vae_state_dict, load_torch_state_dict

    sd = load_torch_state_dict(path)
    params = convert_hunyuan_vae_state_dict(sd)
    vae = AutoencoderKLCausal3D(AutoEncoder3DConfig(dtype="fp32"))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 3, 5, 64, 64)) * 0.5, jnp.float32)
    params = jax.tree.map(lambda v: np.asarray(v, np.float32), params)
    z = vae.apply(
        {"params": params}, x, rngs={"gaussian": jax.random.PRNGKey(1)},
        method=AutoencoderKLCausal3D.encode,
    )
    y = vae.apply({"params": params}, z, method=AutoencoderKLCausal3D.decode)
    report = {
        "kind": "vae", "n_tensors": len(sd),
        "latent": _stats("z", z), "recon": _stats("y", y),
        "recon_mse": float(np.mean((np.asarray(y) - np.asarray(x)) ** 2)),
    }
    if ref_npz:
        ref = np.load(ref_npz)
        np.testing.assert_allclose(np.asarray(z), ref["expected"], atol=2e-3, rtol=2e-3)
        report["ref_parity"] = "PASS"
    return report


def main():
    from opensora_tpu.utils.config import apply_jax_platform_env

    apply_jax_platform_env()  # JAX_PLATFORMS must actually win over plugins
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["mmdit", "vae"])
    p.add_argument("checkpoint")
    p.add_argument("--ref-npz", default=None,
                   help=".npz with 'expected' outputs captured from torch on "
                        "the same deterministic inputs (rng seed 0; see "
                        "mmdit_fixture_inputs)")
    p.add_argument("--src-rope", default="split",
                   choices=("split", "interleaved"),
                   help="RoPE convention the checkpoint was trained with "
                        "(published Open-Sora-v2 = split/liger)")
    a = p.parse_args()
    if a.kind == "mmdit":
        report = verify_mmdit(a.checkpoint, a.ref_npz, src_rope=a.src_rope)
    else:
        report = verify_vae(a.checkpoint, a.ref_npz)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
