"""Torch-checkpoint interop: a synthetic flux-layout state dict converts into
our scanned flax pytree, and the 'split' RoPE permutation is semantics-
preserving — the model output matches the 'interleaved' (reference-exact)
convention bit-for-bit at fp32 tolerance (SURVEY.md hard part #4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opensora_tpu.models.mmdit.model import MMDiTConfig, MMDiTModel
from opensora_tpu.utils.ckpt import convert_mmdit_state_dict

H, HEADS, DEPTH, DEPTH_S = 32, 2, 2, 2
HEAD_DIM = H // HEADS
MLP = int(H * 2.0)
CTX, VEC, INC = 16, 8, 8


def _make_torch_sd(rng, h=H, head_dim=HEAD_DIM, depth=DEPTH, depth_s=DEPTH_S,
                   mlp=MLP, ctx=CTX, vec=VEC, inc=INC):
    """Random flux-layout torch state dict (weight = (out, in))."""
    sd = {}

    def lin(name, fin, fout, bias=True):
        sd[f"{name}.weight"] = rng.normal(size=(fout, fin)).astype(np.float32) * 0.05
        if bias:
            sd[f"{name}.bias"] = rng.normal(size=(fout,)).astype(np.float32) * 0.05

    lin("img_in", inc, h)
    lin("txt_in", ctx, h)
    for p in ("time_in", "vector_in", "guidance_in"):
        fin = 256 if p != "vector_in" else vec
        lin(f"{p}.in_layer", fin, h)
        lin(f"{p}.out_layer", h, h)
    lin("cond_in", inc + 4, h)
    for i in range(depth):
        p = f"double_blocks.{i}"
        lin(f"{p}.img_mod.lin", h, 6 * h)
        lin(f"{p}.txt_mod.lin", h, 6 * h)
        for s in ("img_attn", "txt_attn"):
            lin(f"{p}.{s}.qkv", h, 3 * h)
            sd[f"{p}.{s}.norm.query_norm.scale"] = np.ones(head_dim, np.float32)
            sd[f"{p}.{s}.norm.key_norm.scale"] = np.ones(head_dim, np.float32)
            lin(f"{p}.{s}.proj", h, h)
        for s in ("img_mlp", "txt_mlp"):
            lin(f"{p}.{s}.0", h, mlp)
            lin(f"{p}.{s}.2", mlp, h)
    for i in range(depth_s):
        p = f"single_blocks.{i}"
        lin(f"{p}.linear1", h, 3 * h + mlp)
        lin(f"{p}.linear2", h + mlp, h)
        sd[f"{p}.norm.query_norm.scale"] = np.ones(head_dim, np.float32)
        sd[f"{p}.norm.key_norm.scale"] = np.ones(head_dim, np.float32)
        lin(f"{p}.modulation.lin", h, 3 * h)
    lin("final_layer.linear", h, inc)
    lin("final_layer.adaLN_modulation.1", h, 2 * h)
    return sd


def _model(rope_convention):
    cfg = MMDiTConfig(
        in_channels=INC, vec_in_dim=VEC, context_in_dim=CTX, hidden_size=H,
        mlp_ratio=2.0, num_heads=HEADS, depth=DEPTH, depth_single_blocks=DEPTH_S,
        axes_dim=[8, 4, 4], qkv_bias=True, guidance_embed=True, cond_embed=True,
        rope_convention=rope_convention, attn_backend="xla", dtype="fp32",
    )
    return MMDiTModel(cfg)


def test_convert_and_rope_convention_equivalence():
    rng = np.random.default_rng(0)
    sd = _make_torch_sd(rng)

    args = (
        jnp.asarray(rng.normal(size=(1, 16, INC)), jnp.float32),
        jnp.asarray(
            np.stack(np.meshgrid(np.arange(4.0), np.arange(2.0), np.arange(2.0),
                                 indexing="ij"), -1).reshape(1, 16, 3)
        ),
        jnp.asarray(rng.normal(size=(1, 4, CTX)), jnp.float32),
        jnp.zeros((1, 4, 3)),
        jnp.full((1,), 0.4),
        jnp.asarray(rng.normal(size=(1, VEC)), jnp.float32),
        jnp.asarray(rng.normal(size=(1, 16, INC + 4)), jnp.float32),
        jnp.full((1,), 4.0),
    )

    outs = {}
    for conv in ("interleaved", "split"):
        params = convert_mmdit_state_dict(
            sd, depth=DEPTH, depth_single=DEPTH_S, num_heads=HEADS,
            head_dim=HEAD_DIM, rope_convention=conv,
            cond_embed=True, guidance_embed=True,
            src_rope_convention="interleaved",
        )
        model = _model(conv)
        # structure must match a fresh init
        ref_params = model.init(jax.random.PRNGKey(0), *args)["params"]
        ref_paths = {
            jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_flatten_with_path(ref_params)[0]
        }
        got_paths = {
            jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]
        }
        assert ref_paths == got_paths, ref_paths ^ got_paths
        for (pth, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(ref_params)[0],
        ):
            assert a.shape == b.shape, (jax.tree_util.keystr(pth), a.shape, b.shape)
        outs[conv] = model.apply({"params": params}, *args)

    # the two conventions are the same model
    assert np.abs(np.asarray(outs["split"]) - np.asarray(outs["interleaved"])).max() < 1e-4


def test_quantized_load_path(tmp_path):
    """from_pretrained + quantized config: fp torch weights are converted to
    QuantDense params at load (utils/ckpt.py::load_model_bundle) and the
    model applies."""
    from safetensors.numpy import save_file

    from opensora_tpu.utils.ckpt import load_model_bundle

    rng = np.random.default_rng(7)
    sd = _make_torch_sd(rng)
    f = str(tmp_path / "tiny_mmdit.safetensors")
    save_file(sd, f)

    cfg = MMDiTConfig(
        in_channels=INC, vec_in_dim=VEC, context_in_dim=CTX, hidden_size=H,
        mlp_ratio=2.0, num_heads=HEADS, depth=DEPTH, depth_single_blocks=DEPTH_S,
        axes_dim=[8, 4, 4], qkv_bias=True, guidance_embed=True, cond_embed=True,
        attn_backend="xla", dtype="fp32", quantized=True,
    )
    module = MMDiTModel(cfg)
    bundle = load_model_bundle(
        module, {"from_pretrained": f, "quantized": True},
        rng=jax.random.PRNGKey(0), kind="mmdit",
    )
    assert "kernel_q" in bundle.variables["params"]["double_blocks"]["img_attn"]["qkv"]
    assert "kernel" in bundle.variables["params"]["img_in"]  # non-block untouched

    args = (
        jnp.asarray(rng.normal(size=(1, 16, INC)), jnp.float32),
        jnp.zeros((1, 16, 3)),
        jnp.asarray(rng.normal(size=(1, 4, CTX)), jnp.float32),
        jnp.zeros((1, 4, 3)),
        jnp.full((1,), 0.4),
        jnp.asarray(rng.normal(size=(1, VEC)), jnp.float32),
        jnp.asarray(rng.normal(size=(1, 16, INC + 4)), jnp.float32),
        jnp.full((1,), 4.0),
    )
    out = module.apply(bundle.variables, *args)
    assert out.shape == (1, 16, INC) and bool(jnp.isfinite(out).all())


def test_hunyuan_vae_export_import_roundtrip():
    """export_hunyuan_vae_state_dict is the exact inverse of
    convert_hunyuan_vae_state_dict (torch-layout interop both ways)."""
    from opensora_tpu.models.hunyuan_vae.model import (
        AutoEncoder3DConfig, AutoencoderKLCausal3D,
    )
    from opensora_tpu.utils.ckpt import (
        convert_hunyuan_vae_state_dict, export_hunyuan_vae_state_dict,
    )

    cfg = AutoEncoder3DConfig(
        block_out_channels=(4, 8, 8, 8), latent_channels=4,
        norm_num_groups=4, layers_per_block=1, dtype="fp32",
    )
    vae = AutoencoderKLCausal3D(cfg)
    x = jnp.zeros((1, 3, 5, 16, 16))
    params = vae.init(
        {"params": jax.random.PRNGKey(0), "gaussian": jax.random.PRNGKey(1)}, x
    )["params"]

    sd = export_hunyuan_vae_state_dict(params)
    assert all("." not in k.rsplit(".", 1)[-1] for k in sd)  # sane leaves
    back = convert_hunyuan_vae_state_dict(sd)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    paths_a = {jax.tree_util.keystr(p) for p, _ in flat_a}
    paths_b = {jax.tree_util.keystr(p) for p, _ in flat_b}
    assert paths_a == paths_b, paths_a ^ paths_b
    b_by_path = {jax.tree_util.keystr(p): v for p, v in flat_b}
    for p, v in flat_a:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(b_by_path[jax.tree_util.keystr(p)]),
            err_msg=jax.tree_util.keystr(p),
        )


def test_mmdit_export_import_roundtrip():
    """export_mmdit_state_dict inverts convert_mmdit_state_dict exactly,
    including the RoPE split-layout permutation and scan unstacking."""
    from opensora_tpu.utils.ckpt import export_mmdit_state_dict

    rng = np.random.default_rng(11)
    sd = _make_torch_sd(rng)
    params = convert_mmdit_state_dict(
        sd, depth=DEPTH, depth_single=DEPTH_S, num_heads=HEADS,
        head_dim=HEAD_DIM, rope_convention="split",
        cond_embed=True, guidance_embed=True,
        src_rope_convention="interleaved",
    )
    back = export_mmdit_state_dict(
        params, num_heads=HEADS, head_dim=HEAD_DIM, rope_convention="split",
        dst_rope_convention="interleaved",
    )
    assert set(back) == set(sd), set(back) ^ set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_vae2d_and_dcae_export_import_roundtrip():
    """The generic AE converter pair is an exact inverse for all three AE
    families (names map 1:1 to the reference layouts; DC-AE norms use flax
    'scale' naming so torch 1-D 'weight' converts uniformly)."""
    from opensora_tpu.models.dc_ae.model import DCAE, DCAEConfig
    from opensora_tpu.models.vae2d.autoencoder_2d import AutoEncoder2D, AutoEncoderConfig
    from opensora_tpu.utils.ckpt import (
        convert_hunyuan_vae_state_dict, export_hunyuan_vae_state_dict,
    )

    m2d = AutoEncoder2D(AutoEncoderConfig(
        resolution=32, ch=8, ch_mult=[1, 2], num_res_blocks=1, z_channels=4, dtype="fp32"
    ))
    p2d = m2d.init(
        {"params": jax.random.PRNGKey(0), "gaussian": jax.random.PRNGKey(1)},
        jnp.zeros((1, 3, 32, 32)),
    )["params"]
    dcae = DCAE(DCAEConfig(
        width_list=(8, 8, 16, 16, 16, 16), encoder_depth_list=(1,) * 6,
        decoder_depth_list=(1,) * 6, latent_channels=8, dtype="fp32",
    ))
    pdc = dcae.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 4, 64, 64)))["params"]

    for params in (p2d, pdc):
        back = convert_hunyuan_vae_state_dict(export_hunyuan_vae_state_dict(params))
        fa = jax.tree_util.tree_flatten_with_path(params)[0]
        fb = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_flatten_with_path(back)[0]}
        assert {jax.tree_util.keystr(k) for k, _ in fa} == set(fb)
        for k, v in fa:
            np.testing.assert_array_equal(
                np.asarray(v), np.asarray(fb[jax.tree_util.keystr(k)]),
                err_msg=jax.tree_util.keystr(k),
            )


def test_convert_equivalence_11b_layer_geometry():
    """The real 11B layer geometry (hidden 3072, 24 heads, head_dim 128,
    axes_dim [16, 56, 56], mlp_ratio 4) at reduced depth 1+1: converter →
    forward parity across both RoPE conventions, and the torch-layout export
    round-trips bit-exactly. This is the torch-free stand-in for real-weight
    parity while no published checkpoint is on disk (reference key layout
    opensora/utils/ckpt.py:84-140); with real weights, the same code path
    runs at depth 19+38.
    """
    from opensora_tpu.utils.ckpt import export_mmdit_state_dict

    h, heads, head_dim, mlp = 3072, 24, 128, 12288
    ctx, vec, inc = 4096, 768, 64
    rng = np.random.default_rng(3)
    sd = _make_torch_sd(
        rng, h=h, head_dim=head_dim, depth=1, depth_s=1, mlp=mlp,
        ctx=ctx, vec=vec, inc=inc,
    )

    L, Lt = 16, 4
    args = (
        jnp.asarray(rng.normal(size=(1, L, inc)), jnp.float32),
        jnp.asarray(
            np.stack(np.meshgrid(np.arange(4.0), np.arange(2.0), np.arange(2.0),
                                 indexing="ij"), -1).reshape(1, L, 3)
        ),
        jnp.asarray(rng.normal(size=(1, Lt, ctx)), jnp.float32),
        jnp.zeros((1, Lt, 3)),
        jnp.full((1,), 0.4),
        jnp.asarray(rng.normal(size=(1, vec)), jnp.float32),
        jnp.asarray(rng.normal(size=(1, L, inc + 4)), jnp.float32),
        jnp.full((1,), 4.0),
    )

    def cfg(conv):
        return MMDiTConfig(
            in_channels=inc, vec_in_dim=vec, context_in_dim=ctx, hidden_size=h,
            mlp_ratio=4.0, num_heads=heads, depth=1, depth_single_blocks=1,
            axes_dim=[16, 56, 56], qkv_bias=True, guidance_embed=True,
            cond_embed=True, rope_convention=conv, attn_backend="xla",
            dtype="fp32",
        )

    outs = {}
    for conv in ("interleaved", "split"):
        params = convert_mmdit_state_dict(
            sd, depth=1, depth_single=1, num_heads=heads, head_dim=head_dim,
            rope_convention=conv, cond_embed=True, guidance_embed=True,
            src_rope_convention="interleaved",
        )
        model = MMDiTModel(cfg(conv))
        # structure check against eval_shape (a real init at this width would
        # double the test's memory for no extra signal)
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), *args)["params"]
        fa = jax.tree_util.tree_flatten_with_path(shapes)[0]
        fb = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_flatten_with_path(params)[0]}
        assert {jax.tree_util.keystr(k) for k, _ in fa} == set(fb)
        for k, s in fa:
            assert s.shape == fb[jax.tree_util.keystr(k)].shape, jax.tree_util.keystr(k)
        outs[conv] = np.asarray(model.apply({"params": params}, *args))
        if conv == "split":
            back = export_mmdit_state_dict(
                params, num_heads=heads, head_dim=head_dim,
                rope_convention="split", dst_rope_convention="interleaved",
            )
            assert set(back) == set(sd)
            for k in sd:
                np.testing.assert_array_equal(back[k], sd[k], err_msg=k)
        del params, model
    assert np.abs(outs["split"] - outs["interleaved"]).max() < 1e-3, (
        np.abs(outs["split"] - outs["interleaved"]).max()
    )


def test_bf16_safetensors_checkpoint_loads(tmp_path):
    """The published checkpoints are BF16 safetensors, which the numpy
    safetensors framework cannot read — the loader must fall back (to
    ml_dtypes-bf16 arrays) and the converter + model must run on them.
    Output parity vs the fp32-saved path within bf16 rounding."""
    import torch
    from safetensors.torch import save_file

    from opensora_tpu.utils.ckpt import (
        convert_mmdit_state_dict,
        load_torch_state_dict,
    )

    rng = np.random.default_rng(13)
    sd = _make_torch_sd(rng)
    f32_path = str(tmp_path / "m_f32.safetensors")
    bf16_path = str(tmp_path / "m_bf16.safetensors")
    save_file({k: torch.from_numpy(v) for k, v in sd.items()}, f32_path)
    save_file(
        {k: torch.from_numpy(v).bfloat16() for k, v in sd.items()}, bf16_path
    )

    def build(path):
        # the raw loaded dict goes straight into the converter — exactly
        # the from_pretrained path (no fp32 upcast; ml_dtypes bf16 arrays
        # must survive the transpose/stack/permute pipeline)
        params = convert_mmdit_state_dict(
            load_torch_state_dict(path),
            depth=DEPTH, depth_single=DEPTH_S, num_heads=HEADS,
            head_dim=HEAD_DIM, rope_convention="split",
            cond_embed=True, guidance_embed=True,
        )
        return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), params)

    p32 = build(f32_path)
    pbf = build(bf16_path)

    args = (
        jnp.asarray(rng.normal(size=(1, 16, INC)), jnp.float32),
        jnp.zeros((1, 16, 3)),
        jnp.asarray(rng.normal(size=(1, 4, CTX)), jnp.float32),
        jnp.zeros((1, 4, 3)),
        jnp.full((1,), 0.4),
        jnp.asarray(rng.normal(size=(1, VEC)), jnp.float32),
        jnp.asarray(rng.normal(size=(1, 16, INC + 4)), jnp.float32),
        jnp.full((1,), 4.0),
    )
    model = _model("split")
    o32 = np.asarray(model.apply({"params": p32}, *args))
    obf = np.asarray(model.apply({"params": pbf}, *args))
    assert np.isfinite(obf).all()
    # bf16 weight rounding only: outputs agree to ~bf16 epsilon scale
    rel = np.linalg.norm(obf - o32) / np.linalg.norm(o32)
    assert rel < 0.02, rel
