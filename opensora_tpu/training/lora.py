"""LoRA fine-tuning for the MMDiT.

Behavioral reference: scripts/diffusion/train.py:198-217 (peft LoRA enabled
through booster.enable_lora on the double/single blocks) and
prepare_models' PeftModel load (utils/sampling.py:536-539).

Functional JAX design: LoRA lives as a separate pytree of (A, B) factors for
every kernel whose path matches ``target_regex``; the effective weights are
``W + scale · A @ B`` merged on the fly inside the loss function, so the
base params stay frozen and only the factor tree receives gradients.
Scanned blocks (leading 'layers' axis) get per-layer factors automatically.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = r".*(qkv|proj|linear1|linear2|img_mlp/\d|txt_mlp/\d|q_proj|k_proj|v_proj|v_mlp)/kernel"


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


def init_lora_params(
    params: Any,
    rng: jax.Array,
    rank: int = 16,
    target_regex: str = DEFAULT_TARGETS,
) -> Dict:
    """Create the LoRA factor tree: for each matching kernel (..., in, out)
    → A (..., in, r) ~ N(0, 1/r), B (..., r, out) = 0 (standard init: the
    merged delta starts at zero)."""
    pattern = re.compile(target_regex)
    counter = [0]

    def make(path, leaf):
        s = _path_str(path)
        if leaf.ndim >= 2 and pattern.fullmatch(s):
            counter[0] += 1
            key = jax.random.fold_in(rng, counter[0])
            *lead, fin, fout = leaf.shape
            a = jax.random.normal(key, (*lead, fin, rank), jnp.float32) / rank
            b = jnp.zeros((*lead, rank, fout), jnp.float32)
            return {"lora_a": a, "lora_b": b}
        return None

    tree = jax.tree_util.tree_map_with_path(make, params)
    # prune Nones
    def prune(node):
        if isinstance(node, dict):
            if set(node.keys()) == {"lora_a", "lora_b"}:
                return node
            out = {k: prune(v) for k, v in node.items()}
            out = {k: v for k, v in out.items() if v is not None}
            return out or None
        return None

    return prune(tree) or {}


def merge_lora(params: Any, lora: Dict, scale: float = 1.0) -> Any:
    """W_eff = W + scale · A @ B, matching subtrees by structure."""

    def walk(p_node, l_node):
        if l_node is None:
            return p_node
        if isinstance(l_node, dict) and set(l_node.keys()) == {"lora_a", "lora_b"}:
            a, b = l_node["lora_a"], l_node["lora_b"]
            delta = jnp.einsum("...ir,...ro->...io", a, b)
            return p_node + (scale * delta).astype(p_node.dtype)
        if isinstance(p_node, dict):
            return {
                k: walk(v, l_node.get(k) if isinstance(l_node, dict) else None)
                for k, v in p_node.items()
            }
        return p_node

    return walk(params, lora)


def lora_loss_wrapper(loss_fn, base_params, scale: float = 1.0):
    """loss(lora, *args) closing over frozen base params."""

    def wrapped(lora, *args, **kwargs):
        return loss_fn(merge_lora(base_params, lora, scale), *args, **kwargs)

    return wrapped


def count_lora_params(lora: Dict) -> int:
    return sum(x.size for x in jax.tree.leaves(lora))
