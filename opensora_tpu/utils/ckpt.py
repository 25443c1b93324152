"""Checkpoint IO: torch-safetensors interop + orbax async training state.

Behavioral reference: opensora/utils/ckpt.py — load_checkpoint (:84-140,
safetensors / .pt / sharded dir / HF hub), CheckpointIO.save/load (:335-524,
async sharded model+EMA+optimizer+sampler state with TensorNVMe). TPU-native
replacements:
- published torch checkpoints map into flax pytrees here (key mapping +
  transpose + scan-stacking + RoPE-layout permutation);
- training state is saved via orbax async checkpointing (tensorstore — a
  native C++ IO engine — underneath), the analogue of the reference's
  TensorNVMe async writer;
- ``keep_n_latest`` GC mirrors rm_checkpoints (:143-169).
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------------
# torch safetensors → flax pytree (MMDiT / flux layout)
# ----------------------------------------------------------------------


def _load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Read a safetensors file as numpy, INCLUDING bf16 tensors.

    The published checkpoints (Open_Sora_v2.safetensors etc.) are bf16,
    which the numpy framework of safetensors cannot represent — fall back
    to the flax framework and keep ml_dtypes.bfloat16 numpy arrays (the
    converters only transpose/stack/slice, all of which ml_dtypes
    supports; fp32 upcasting of an 11B checkpoint would double host RAM)."""
    from safetensors import safe_open

    out = {}
    try:
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    except Exception:
        out.clear()
    with safe_open(path, framework="flax") as f:
        for k in f.keys():
            out[k] = np.asarray(f.get_tensor(k))
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint (.safetensors / .pt / sharded dir) as numpy."""
    if os.path.isdir(path):
        out = {}
        for fn in sorted(os.listdir(path)):
            if fn.endswith(".safetensors"):
                out.update(_load_safetensors(os.path.join(path, fn)))
        if out:
            return out
        raise FileNotFoundError(f"no safetensors shards in {path}")
    if path.endswith(".safetensors"):
        return _load_safetensors(path)
    # .pt / .pth via torch (CPU build is available in the image)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items()}


def _lin(sd, prefix):
    """torch Linear → flax Dense: kernel = weight.T."""
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _stack(items):
    return jax.tree.map(lambda *xs: np.stack(xs), *items)


def _qk_permuter(src_rope: str, dst_rope: str, num_heads: int, head_dim: int):
    """Channel permutation taking q/k projection outputs from the
    convention the checkpoint was trained with to the in-memory one.

    Conventions (ops/rope.py): "interleaved" = Flux-original pairs
    (2i, 2i+1); "split" = rotate-half/liger pairs (i, i+D/2). The PUBLISHED
    Open-Sora-v2 checkpoints were trained with ``use_liger_rope=True``
    (configs/diffusion/inference/256px.py:41), i.e. their q/k channels are
    already in the split convention — loading them must NOT permute.
    """
    from opensora_tpu.ops.rope import permute_qk_weight

    if src_rope == dst_rope:
        return lambda w: w
    inverse = (src_rope, dst_rope) == ("split", "interleaved")
    if not inverse and (src_rope, dst_rope) != ("interleaved", "split"):
        raise ValueError(f"unknown rope conversion {src_rope!r} -> {dst_rope!r}")
    return lambda w: permute_qk_weight(w, num_heads, head_dim, out_axis=-1,
                                       inverse=inverse)


def convert_mmdit_state_dict(
    sd: Dict[str, np.ndarray],
    depth: int,
    depth_single: int,
    num_heads: int,
    head_dim: int,
    rope_convention: str = "split",
    cond_embed: bool = False,
    guidance_embed: bool = True,
    fused_qkv: bool = True,
    src_rope_convention: str = "split",
) -> Dict[str, Any]:
    """Map a flux/Open-Sora-v2 torch state dict (reference
    models/mmdit/model.py key names) into our scanned flax pytree.

    Handles BOTH torch module layouts — fused (``qkv``/``linear1``) and the
    published checkpoints' unfused one (``q_proj``/``k_proj``/``v_proj``,
    ``v_mlp``; configs/diffusion/inference/256px.py:40 ``fused_qkv=False``)
    — auto-detected from the keys, and emits whichever layout the target
    model uses (``fused_qkv``). Per-layer weights are stacked on a leading
    ``layers`` axis (nn.scan).

    ``src_rope_convention`` names the RoPE pairing the weights were trained
    with: "split" (liger rotate-half — the published checkpoints) or
    "interleaved" (Flux original). q/k output channels are permuted exactly
    when it differs from the in-memory ``rope_convention`` — attention
    outputs are unchanged by the basis change (ops/rope.py).
    """
    qk_perm = _qk_permuter(src_rope_convention, rope_convention,
                           num_heads, head_dim)
    hidden3 = 3 * num_heads * head_dim
    src_fused = "double_blocks.0.img_attn.qkv.weight" in sd

    def fused_attn_lin(prefix):
        """One (in, 3*H*D) kernel [q|k|v] + bias from either src layout,
        q/k already permuted to the in-memory rope convention."""
        if src_fused:
            lin = _lin(sd, f"{prefix}.qkv")
            q_w, k_w, v_w = np.split(lin["kernel"], 3, axis=-1)
            has_bias = "bias" in lin
            if has_bias:
                qb, kb, vb = np.split(lin["bias"], 3, axis=-1)
        else:
            q, k, v = (_lin(sd, f"{prefix}.{n}") for n in ("q_proj", "k_proj", "v_proj"))
            q_w, k_w, v_w = q["kernel"], k["kernel"], v["kernel"]
            has_bias = "bias" in q
            if has_bias:
                qb, kb, vb = q["bias"], k["bias"], v["bias"]
        out = {"kernel": np.concatenate(
            [qk_perm(q_w), qk_perm(k_w), v_w], axis=-1)}
        if has_bias:
            out["bias"] = np.concatenate([qk_perm(qb), qk_perm(kb), vb], axis=-1)
        return out

    def emit_attn(prefix):
        """SelfAttention qkv in the target layout."""
        lin = fused_attn_lin(prefix)
        if fused_qkv:
            return {"qkv": lin}
        q_w, k_w, v_w = np.split(lin["kernel"], 3, axis=-1)
        out = {"q_proj": {"kernel": q_w}, "k_proj": {"kernel": k_w},
               "v_proj": {"kernel": v_w}}
        if "bias" in lin:
            qb, kb, vb = np.split(lin["bias"], 3, axis=-1)
            out["q_proj"]["bias"], out["k_proj"]["bias"], out["v_proj"]["bias"] = qb, kb, vb
        return out

    def fused_lin1(prefix):
        """Single-block (in, 3*H*D + mlp) kernel [q|k|v|mlp] from either
        src layout (unfused = q_proj + k_proj + v_mlp, the v/mlp halves
        fused in one projection — reference layers.py:321-333)."""
        if src_fused:
            lin = _lin(sd, f"{prefix}.linear1")
            k = lin["kernel"]
            q_w, k_w, v_w = np.split(k[:, :hidden3], 3, axis=-1)
            vm_w = np.concatenate([v_w, k[:, hidden3:]], axis=-1)
            has_bias = "bias" in lin
            if has_bias:
                b = lin["bias"]
                qb, kb, vb = np.split(b[:hidden3], 3)
                vmb = np.concatenate([vb, b[hidden3:]])
        else:
            q, k, vm = (_lin(sd, f"{prefix}.{n}") for n in ("q_proj", "k_proj", "v_mlp"))
            q_w, k_w, vm_w = q["kernel"], k["kernel"], vm["kernel"]
            has_bias = "bias" in q
            if has_bias:
                qb, kb, vmb = q["bias"], k["bias"], vm["bias"]
        out = {"kernel": np.concatenate(
            [qk_perm(q_w), qk_perm(k_w), vm_w], axis=-1)}
        if has_bias:
            out["bias"] = np.concatenate([qk_perm(qb), qk_perm(kb), vmb])
        return out

    def emit_lin1(prefix):
        lin = fused_lin1(prefix)
        if fused_qkv:
            return {"linear1": lin}
        hd = num_heads * head_dim
        k = lin["kernel"]
        out = {"q_proj": {"kernel": k[:, :hd]},
               "k_proj": {"kernel": k[:, hd:2 * hd]},
               "v_mlp": {"kernel": k[:, 2 * hd:]}}
        if "bias" in lin:
            b = lin["bias"]
            out["q_proj"]["bias"], out["k_proj"]["bias"] = b[:hd], b[hd:2 * hd]
            out["v_mlp"]["bias"] = b[2 * hd:]
        return out

    def mlp_embedder(prefix):
        return {
            "in_layer": _lin(sd, f"{prefix}.in_layer"),
            "out_layer": _lin(sd, f"{prefix}.out_layer"),
        }

    def qknorm(prefix):
        return {
            "query_norm": {"scale": sd[f"{prefix}.query_norm.scale"]},
            "key_norm": {"scale": sd[f"{prefix}.key_norm.scale"]},
        }

    def double_block(i):
        p = f"double_blocks.{i}"
        return {
            "img_mod": {"lin": _lin(sd, f"{p}.img_mod.lin")},
            "txt_mod": {"lin": _lin(sd, f"{p}.txt_mod.lin")},
            "img_attn": {
                **emit_attn(f"{p}.img_attn"),
                "norm": qknorm(f"{p}.img_attn.norm"),
                "proj": _lin(sd, f"{p}.img_attn.proj"),
            },
            "txt_attn": {
                **emit_attn(f"{p}.txt_attn"),
                "norm": qknorm(f"{p}.txt_attn.norm"),
                "proj": _lin(sd, f"{p}.txt_attn.proj"),
            },
            "img_mlp": {"0": _lin(sd, f"{p}.img_mlp.0"), "2": _lin(sd, f"{p}.img_mlp.2")},
            "txt_mlp": {"0": _lin(sd, f"{p}.txt_mlp.0"), "2": _lin(sd, f"{p}.txt_mlp.2")},
        }

    def single_block(i):
        p = f"single_blocks.{i}"
        return {
            **emit_lin1(p),
            "linear2": _lin(sd, f"{p}.linear2"),
            "norm": qknorm(f"{p}.norm"),
            "modulation": {"lin": _lin(sd, f"{p}.modulation.lin")},
        }

    params: Dict[str, Any] = {
        "img_in": _lin(sd, "img_in"),
        "txt_in": _lin(sd, "txt_in"),
        "time_in": mlp_embedder("time_in"),
        "vector_in": mlp_embedder("vector_in"),
        "double_blocks": _stack([double_block(i) for i in range(depth)]),
        "single_blocks": _stack([single_block(i) for i in range(depth_single)]),
        "final_layer": {
            "linear": _lin(sd, "final_layer.linear"),
            "adaLN_modulation": _lin(sd, "final_layer.adaLN_modulation.1"),
        },
    }
    if guidance_embed and "guidance_in.in_layer.weight" in sd:
        params["guidance_in"] = mlp_embedder("guidance_in")
    if cond_embed and "cond_in.weight" in sd:
        params["cond_in"] = _lin(sd, "cond_in")
    return params


def export_mmdit_state_dict(
    params: Dict[str, Any],
    num_heads: int,
    head_dim: int,
    rope_convention: str = "split",
    dst_fused: Optional[bool] = None,
    dst_rope_convention: str = "split",
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_mmdit_state_dict`: scanned flax pytree →
    flux/Open-Sora-v2 torch layout (for safetensors export).

    Unstacks the nn.scan layer axis; the in-memory layout (fused or
    unfused, auto-detected; ``rope_convention``) is re-expressed in the
    requested torch layout: ``dst_fused`` (None = keep the in-memory
    layout) + ``dst_rope_convention``. Defaults round-trip with
    :func:`convert_mmdit_state_dict`'s defaults and match the PUBLISHED
    checkpoints' liger/"split" q-k channel pairing; pass
    ``dst_rope_convention="interleaved"`` for the Flux-original layout.
    Roundtrip identity is locked by tests/test_ckpt_interop.py."""
    if dst_fused is None:
        dst_fused = "qkv" in params["double_blocks"]["img_attn"]
    qk_perm = _qk_permuter(rope_convention, dst_rope_convention,
                           num_heads, head_dim)
    hd = num_heads * head_dim
    out: Dict[str, np.ndarray] = {}

    def put_lin(prefix, node):
        out[f"{prefix}.weight"] = np.ascontiguousarray(np.asarray(node["kernel"]).T)
        if "bias" in node:
            out[f"{prefix}.bias"] = np.asarray(node["bias"])

    def gather_fused(node, names, splits):
        """(kernel, bias|None) of the concatenated projection from either
        in-memory layout. ``names`` are the unfused module names; ``splits``
        their output widths (for the fused-in-memory split points)."""
        if names[0] in node:  # unfused in memory
            ks = [np.asarray(node[n]["kernel"]) for n in names]
            bs = [np.asarray(node[n]["bias"]) for n in names] \
                if "bias" in node[names[0]] else None
        else:
            fused_name = "qkv" if "qkv" in node else "linear1"
            k = np.asarray(node[fused_name]["kernel"])
            idx = np.cumsum(splits)[:-1]
            ks = np.split(k, idx, axis=-1)
            bs = np.split(np.asarray(node[fused_name]["bias"]), idx) \
                if "bias" in node[fused_name] else None
        ks[0], ks[1] = qk_perm(ks[0]), qk_perm(ks[1])
        if bs is not None:
            bs[0], bs[1] = qk_perm(bs[0]), qk_perm(bs[1])
        return ks, bs

    def put_proj(prefix, names, ks, bs):
        """Emit torch keys in the dst layout; ``names`` = unfused names,
        with the fused name derived from the block kind."""
        if dst_fused:
            fused_name = "qkv" if names[-1] == "v_proj" else "linear1"
            node = {"kernel": np.concatenate(ks, axis=-1)}
            if bs is not None:
                node["bias"] = np.concatenate(bs)
            put_lin(f"{prefix}.{fused_name}", node)
        else:
            for n, k, i in zip(names, ks, range(len(ks))):
                node = {"kernel": k}
                if bs is not None:
                    node["bias"] = bs[i]
                put_lin(f"{prefix}.{n}", node)

    def put_mlp_embedder(prefix, node):
        put_lin(f"{prefix}.in_layer", node["in_layer"])
        put_lin(f"{prefix}.out_layer", node["out_layer"])

    def put_qknorm(prefix, node):
        out[f"{prefix}.query_norm.scale"] = np.asarray(node["query_norm"]["scale"])
        out[f"{prefix}.key_norm.scale"] = np.asarray(node["key_norm"]["scale"])

    def layer_slice(tree, i):
        return jax.tree.map(lambda x: np.asarray(x)[i], tree)

    put_lin("img_in", params["img_in"])
    put_lin("txt_in", params["txt_in"])
    put_mlp_embedder("time_in", params["time_in"])
    put_mlp_embedder("vector_in", params["vector_in"])
    if "guidance_in" in params:
        put_mlp_embedder("guidance_in", params["guidance_in"])
    if "cond_in" in params:
        put_lin("cond_in", params["cond_in"])

    n_double = next(iter(jax.tree.leaves(params["double_blocks"]))).shape[0]
    for i in range(n_double):
        blk = layer_slice(params["double_blocks"], i)
        p = f"double_blocks.{i}"
        put_lin(f"{p}.img_mod.lin", blk["img_mod"]["lin"])
        put_lin(f"{p}.txt_mod.lin", blk["txt_mod"]["lin"])
        for s in ("img_attn", "txt_attn"):
            ks, bs = gather_fused(blk[s], ("q_proj", "k_proj", "v_proj"),
                                  (hd, hd, hd))
            put_proj(f"{p}.{s}", ("q_proj", "k_proj", "v_proj"), ks, bs)
            put_qknorm(f"{p}.{s}.norm", blk[s]["norm"])
            put_lin(f"{p}.{s}.proj", blk[s]["proj"])
        for s in ("img_mlp", "txt_mlp"):
            put_lin(f"{p}.{s}.0", blk[s]["0"])
            put_lin(f"{p}.{s}.2", blk[s]["2"])

    n_single = next(iter(jax.tree.leaves(params["single_blocks"]))).shape[0]
    for i in range(n_single):
        blk = layer_slice(params["single_blocks"], i)
        p = f"single_blocks.{i}"
        mlp_w = (np.asarray(blk["v_mlp"]["kernel"]).shape[-1] - hd
                 if "v_mlp" in blk else
                 np.asarray(blk["linear1"]["kernel"]).shape[-1] - 3 * hd)
        ks, bs = gather_fused(blk, ("q_proj", "k_proj", "v_mlp"),
                              (hd, hd, hd + mlp_w))
        put_proj(p, ("q_proj", "k_proj", "v_mlp"), ks, bs)
        put_lin(f"{p}.linear2", blk["linear2"])
        put_qknorm(f"{p}.norm", blk["norm"])
        put_lin(f"{p}.modulation.lin", blk["modulation"]["lin"])

    put_lin("final_layer.linear", params["final_layer"]["linear"])
    put_lin("final_layer.adaLN_modulation.1", params["final_layer"]["adaLN_modulation"])
    return out


def convert_hunyuan_vae_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map the HunyuanVideo VAE torch layout into our flax pytree.

    torch Conv3d weight (O, I, kT, kH, kW) → flax Conv kernel (kT, kH, kW, I, O).
    Attention to_out.0 → to_out. GroupNorm weight/bias → scale/bias.
    """
    out: Dict[str, Any] = {}

    def put(tree, keys, val):
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = val

    for key, val in sd.items():
        parts = key.split(".")
        # drop torch container indices: resnets.0 → resnets_0, etc.
        norm_parts = []
        i = 0
        while i < len(parts):
            p = parts[i]
            if i + 1 < len(parts) and parts[i + 1].isdigit():
                norm_parts.append(f"{p}_{parts[i + 1]}")
                i += 2
            else:
                norm_parts.append(p)
                i += 1
        leaf = norm_parts[-1]
        path = norm_parts[:-1]

        # diffusers attention naming: to_out_0 → to_out
        path = [("to_out" if p == "to_out_0" else p) for p in path]

        if leaf == "weight":
            if val.ndim == 5:  # conv3d
                # both stacks nest identically (the reference's CausalConv3d
                # also holds its Conv3d as ".conv", and DC-AE aggreg convs
                # are raw in both) — names map 1:1, no segment surgery
                kernel = np.transpose(val, (2, 3, 4, 1, 0))
                put(out, path + ["kernel"], kernel)
            elif val.ndim == 4:  # conv2d
                put(out, path + ["kernel"], np.transpose(val, (2, 3, 1, 0)))
            elif val.ndim == 2:  # linear
                put(out, path + ["kernel"], np.ascontiguousarray(val.T))
            else:  # norm scale
                put(out, path + ["scale"], val)
        elif leaf == "bias":
            put(out, path + ["bias"], val)
        else:
            put(out, path + [leaf], val)
    return out


def init_ae_variables(ae, model_cfg: Dict[str, Any], rng, x0) -> Dict[str, Any]:
    """Load an AE's variables from ``from_pretrained`` when configured,
    else random-init from ``x0`` — the shared pattern of the VAE CLIs
    (scripts/vae/{train,inference,stats}.py)."""
    if isinstance(model_cfg, dict) and model_cfg.get("from_pretrained"):
        kind = {"dc_ae": "dc_ae", "autoencoder_2d": "vae2d"}.get(
            model_cfg.get("type"), "hunyuan_vae"
        )
        return load_checkpoint(ae, model_cfg["from_pretrained"], kind=kind)
    return ae.init({"params": rng, "gaussian": rng}, x0)


def export_hunyuan_vae_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_hunyuan_vae_state_dict`: flax pytree →
    torch-layout state dict (for safetensors export / ecosystem interop).

    Roundtrip identity is locked by tests/test_ckpt_interop.py."""
    out: Dict[str, np.ndarray] = {}

    def seg_to_torch(seg: str) -> str:
        if seg == "to_out":
            return "to_out.0"
        head, _, tail = seg.rpartition("_")
        if head and tail.isdigit():
            return f"{head}.{tail}"
        return seg

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [k])
            return
        leaf = path[-1]
        segs = path[:-1]
        val = np.asarray(node)
        if leaf == "kernel":
            if val.ndim == 5:
                # the reference's CausalConv3d also nests its Conv3d under
                # ".conv" (unet_causal_3d_blocks.py:92), so flax paths map
                # 1:1 — no segment surgery needed
                val = np.transpose(val, (4, 3, 0, 1, 2))
            elif val.ndim == 4:
                val = np.transpose(val, (3, 2, 0, 1))
            else:
                val = np.ascontiguousarray(val.T)
            tleaf = "weight"
        elif leaf == "scale":
            tleaf = "weight"
        else:
            tleaf = leaf
        name = ".".join(seg_to_torch(s) for s in segs) + f".{tleaf}"
        out[name] = val

    walk(params, [])
    return out


def load_checkpoint(
    module,
    from_pretrained: str,
    kind: str = "mmdit",
    dtype: Optional[jnp.dtype] = None,
) -> Dict[str, Any]:
    """Load torch weights into a flax variables dict for ``module``."""
    sd = load_torch_state_dict(from_pretrained)
    if kind == "mmdit":
        cfg = module.config
        params = convert_mmdit_state_dict(
            sd,
            depth=cfg.depth,
            depth_single=cfg.depth_single_blocks,
            num_heads=cfg.num_heads,
            head_dim=cfg.hidden_size // cfg.num_heads,
            rope_convention=cfg.rope_convention,
            cond_embed=cfg.cond_embed,
            guidance_embed=cfg.guidance_embed,
            fused_qkv=cfg.fused_qkv,
            src_rope_convention=getattr(cfg, "ckpt_rope_convention", "split"),
        )
    elif kind in ("hunyuan_vae", "dc_ae", "vae2d"):
        # generic torch conv/linear/norm mapping; module trees mirror the
        # torch layouts so the name normalization covers all three AEs
        params = convert_hunyuan_vae_state_dict(sd)
    else:
        raise ValueError(f"unknown checkpoint kind {kind!r}")
    if dtype is not None:
        params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    return {"params": params}


def load_model_bundle(module, model_cfg, rng, init: bool = True, kind: str = "mmdit"):
    """Build a ModelBundle: pretrained weights if configured, else random
    init is deferred to the caller (who knows the sample shapes)."""
    from opensora_tpu.utils.api import ModelBundle

    pretrained = None
    if isinstance(model_cfg, dict):
        pretrained = model_cfg.get("from_pretrained")
    if pretrained:
        variables = load_checkpoint(module, pretrained, kind=kind)
        if kind == "mmdit" and isinstance(model_cfg, dict) and model_cfg.get("quantized"):
            # quantized configs (256px_int8 / 256px_w8a8) expect QuantDense
            # params: convert block Dense kernels to int8 + scales at load
            from opensora_tpu.ops.quant import quantize_params

            variables = dict(variables)
            variables["params"] = quantize_params(variables["params"])
        return ModelBundle(module, variables)
    return ModelBundle(module, None)


# ----------------------------------------------------------------------
# training-state checkpointing (orbax)
# ----------------------------------------------------------------------


class CheckpointIO:
    """Async sharded train-state IO (reference utils/ckpt.py:335-524).

    Layout per step: <exp_dir>/epoch{e}-global_step{s}/
      state/       orbax sharded pytree (params, opt_state, ema, step)
      running_states.json   epoch/step counters
      sampler_state.json    stateful-sampler resume point
    """

    def __init__(self, n_write_entries: int = 32):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._ckpt = ocp.StandardCheckpointer()

    def save(
        self,
        exp_dir: str,
        state,
        epoch: int,
        step: int,
        global_step: int,
        sampler_state: Optional[dict] = None,
        keep_n_latest: int = -1,
        async_io: bool = True,
    ) -> str:
        # orbax/tensorstore rejects relative paths; configs commonly use
        # relative save dirs ("outputs/...")
        exp_dir = os.path.abspath(exp_dir)
        d = os.path.join(exp_dir, f"epoch{epoch}-global_step{global_step}")
        os.makedirs(d, exist_ok=True)
        self._ckpt.save(os.path.join(d, "state"), state, force=True)
        if not async_io:
            self._ckpt.wait_until_finished()
        if jax.process_index() == 0:
            with open(os.path.join(d, "running_states.json"), "w") as f:
                json.dump(
                    {"epoch": epoch, "step": step, "global_step": global_step}, f
                )
            if sampler_state is not None:
                with open(os.path.join(d, "sampler_state.json"), "w") as f:
                    json.dump(sampler_state, f)
        if keep_n_latest > 0:
            self.rm_checkpoints(exp_dir, keep_n_latest)
        return d

    def wait(self):
        self._ckpt.wait_until_finished()

    def load(self, path: str, state_template):
        path = os.path.abspath(path)
        state = self._ckpt.restore(os.path.join(path, "state"), state_template)
        running = {"epoch": 0, "step": 0, "global_step": 0}
        rs = os.path.join(path, "running_states.json")
        if os.path.exists(rs):
            with open(rs) as f:
                running = json.load(f)
        sampler_state = None
        ss = os.path.join(path, "sampler_state.json")
        if os.path.exists(ss):
            with open(ss) as f:
                sampler_state = json.load(f)
        return state, running, sampler_state

    @staticmethod
    def rm_checkpoints(exp_dir: str, keep_n_latest: int):
        """GC old checkpoints (reference ckpt.py:143-169)."""
        if jax.process_index() != 0:
            return
        pat = re.compile(r"epoch(\d+)-global_step(\d+)")
        entries = []
        for name in os.listdir(exp_dir):
            m = pat.fullmatch(name)
            if m:
                entries.append((int(m.group(2)), name))
        entries.sort(reverse=True)
        for _, name in entries[keep_n_latest:]:
            shutil.rmtree(os.path.join(exp_dir, name), ignore_errors=True)


def convert_t5_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map HF T5EncoderModel torch weights into our flax T5Encoder pytree
    (models/text/t5.py). T5 linears have no bias; layer norms are scale-only."""
    out: Dict[str, Any] = {"shared": {"embedding": sd["shared.weight"]}}

    def lin(prefix):
        return {"kernel": np.ascontiguousarray(sd[prefix + ".weight"].T)}

    i = 0
    while f"encoder.block.{i}.layer.0.SelfAttention.q.weight" in sd:
        p = f"encoder.block.{i}.layer.0"
        blk = {
            "ln_attn": {"weight": sd[f"{p}.layer_norm.weight"]},
            "attention": {
                "q": lin(f"{p}.SelfAttention.q"),
                "k": lin(f"{p}.SelfAttention.k"),
                "v": lin(f"{p}.SelfAttention.v"),
                "o": lin(f"{p}.SelfAttention.o"),
            },
        }
        if i == 0:
            blk["attention"]["relative_attention_bias"] = sd[
                f"{p}.SelfAttention.relative_attention_bias.weight"
            ]
        pf = f"encoder.block.{i}.layer.1"
        blk.update({
            "ln_ff": {"weight": sd[f"{pf}.layer_norm.weight"]},
            "wi_0": lin(f"{pf}.DenseReluDense.wi_0"),
            "wi_1": lin(f"{pf}.DenseReluDense.wi_1"),
            "wo": lin(f"{pf}.DenseReluDense.wo"),
        })
        out[f"block_{i}"] = blk
        i += 1
    out["final_layer_norm"] = {"weight": sd["encoder.final_layer_norm.weight"]}
    return out


def convert_clip_text_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map HF CLIPTextModel torch weights into our flax CLIPTextModel pytree
    (models/text/clip.py)."""
    pre = "text_model."

    def lin(prefix):
        out = {"kernel": np.ascontiguousarray(sd[pre + prefix + ".weight"].T)}
        if pre + prefix + ".bias" in sd:
            out["bias"] = sd[pre + prefix + ".bias"]
        return out

    def ln(prefix):
        return {
            "scale": sd[pre + prefix + ".weight"],
            "bias": sd[pre + prefix + ".bias"],
        }

    out: Dict[str, Any] = {
        "token_embedding": {"embedding": sd[pre + "embeddings.token_embedding.weight"]},
        "position_embedding": sd[pre + "embeddings.position_embedding.weight"],
        "final_layer_norm": ln("final_layer_norm"),
    }
    i = 0
    while pre + f"encoder.layers.{i}.self_attn.q_proj.weight" in sd:
        p = f"encoder.layers.{i}"
        out[f"layers_{i}"] = {
            "layer_norm1": ln(f"{p}.layer_norm1"),
            "layer_norm2": ln(f"{p}.layer_norm2"),
            "q_proj": lin(f"{p}.self_attn.q_proj"),
            "k_proj": lin(f"{p}.self_attn.k_proj"),
            "v_proj": lin(f"{p}.self_attn.v_proj"),
            "out_proj": lin(f"{p}.self_attn.out_proj"),
            "fc1": lin(f"{p}.mlp.fc1"),
            "fc2": lin(f"{p}.mlp.fc2"),
        }
        i += 1
    return out


def convert_clip_vision_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map HF CLIPVisionModel / CLIPModel torch weights into our flax
    CLIPVisionModel pytree (models/text/clip.py::CLIPVisionModel).

    Accepts either a bare vision tower ("vision_model."-prefixed) or a full
    CLIPModel dump. torch Conv2d (O, I, kh, kw) → flax (kh, kw, I, O)."""
    pre = "vision_model."

    def lin(prefix):
        out = {"kernel": np.ascontiguousarray(sd[pre + prefix + ".weight"].T)}
        if pre + prefix + ".bias" in sd:
            out["bias"] = sd[pre + prefix + ".bias"]
        return out

    def ln(prefix):
        return {
            "scale": sd[pre + prefix + ".weight"],
            "bias": sd[pre + prefix + ".bias"],
        }

    out: Dict[str, Any] = {
        "patch_embedding": {
            "kernel": np.transpose(
                sd[pre + "embeddings.patch_embedding.weight"], (2, 3, 1, 0)
            )
        },
        "class_embedding": sd[pre + "embeddings.class_embedding"],
        "position_embedding": sd[pre + "embeddings.position_embedding.weight"],
        "pre_layrnorm": ln("pre_layrnorm"),
        "post_layernorm": ln("post_layernorm"),
    }
    i = 0
    while pre + f"encoder.layers.{i}.self_attn.q_proj.weight" in sd:
        p = f"encoder.layers.{i}"
        out[f"layers_{i}"] = {
            "layer_norm1": ln(f"{p}.layer_norm1"),
            "layer_norm2": ln(f"{p}.layer_norm2"),
            "q_proj": lin(f"{p}.self_attn.q_proj"),
            "k_proj": lin(f"{p}.self_attn.k_proj"),
            "v_proj": lin(f"{p}.self_attn.v_proj"),
            "out_proj": lin(f"{p}.self_attn.out_proj"),
            "fc1": lin(f"{p}.mlp.fc1"),
            "fc2": lin(f"{p}.mlp.fc2"),
        }
        i += 1
    return out
