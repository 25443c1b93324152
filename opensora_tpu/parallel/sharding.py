"""Parameter/activation sharding rules (TP + FSDP) for pjit.

TPU-native replacement for the reference's ColossalAI Shardformer policies
(opensora/models/mmdit/distributed.py:686-883 MMDiTPolicy Linear1D col/row,
opensora/utils/train.py:73-128 ZeRO plugins):

- **TP** — qkv/linear1/mlp-in kernels shard their output features on 'tp'
  (column parallel); proj/linear2/mlp-out shard input features on 'tp'
  (row parallel). XLA inserts the psum the reference's Linear1D_Row does by
  hand.
- **FSDP/ZeRO** — remaining large kernels shard a non-TP axis over 'data';
  optimizer state inherits the same specs through the pytree, which is
  exactly ZeRO-1/2 (XLA overlaps the all-gathers ≙ overlap_allgather).
- Scanned blocks carry a leading 'layers' axis (never sharded).
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opensora_tpu.parallel.mesh import DATA_AXIS, SP_AXIS, TP_AXIS

# (regex over 'a/b/c' param path, spec builder(ndim) -> PartitionSpec)
# Column-parallel (output features on tp): qkv, single-block linear1, mlp-in.
# Row-parallel (input features on tp): attn proj, single-block linear2, mlp-out.
_COL = r"(qkv|linear1|img_mlp/0|txt_mlp/0|q_proj|k_proj|v_proj|v_mlp)"
_ROW = r"(proj|linear2|img_mlp/2|txt_mlp/2)"


def _mmdit_rules(fsdp: bool):
    dp = DATA_AXIS if fsdp else None
    return [
        (rf".*{_COL}/kernel", lambda nd: P(*([None] * (nd - 2)), dp, TP_AXIS)),
        (rf".*{_COL}/bias", lambda nd: P(*([None] * (nd - 1)), TP_AXIS)),
        (rf".*{_ROW}/kernel", lambda nd: P(*([None] * (nd - 2)), TP_AXIS, dp)),
        (rf".*{_ROW}/bias", lambda nd: P(*([None] * nd))),
        # modulation / embedders / final layer: replicate over tp, FSDP the
        # larger axis when enabled
        (r".*(mod|modulation|adaLN_modulation|lin)/kernel", lambda nd: P(*([None] * (nd - 2)), dp, None)),
        (r".*(img_in|txt_in|cond_in|in_layer|out_layer|linear)/kernel", lambda nd: P(*([None] * (nd - 2)), dp, None)),
    ]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def mmdit_param_specs(params, fsdp: bool = True):
    """PartitionSpec pytree for MMDiT params (same tree structure)."""
    rules = _mmdit_rules(fsdp)

    def spec_for(path, leaf):
        s = _path_str(path)
        nd = np.ndim(leaf) if not hasattr(leaf, "ndim") else leaf.ndim
        for pattern, builder in rules:
            if re.fullmatch(pattern, s):
                spec = builder(nd)
                # drop axes that exceed rank (safety)
                if len(spec) > nd:
                    spec = P(*spec[len(spec) - nd:])
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def replicated_specs(params):
    return jax.tree.map(lambda _: P(), params)


def make_shardings(mesh: Mesh, specs):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(mesh: Mesh, params, fsdp: bool = True):
    """Device-put params according to the MMDiT rules."""
    shardings = make_shardings(mesh, mmdit_param_specs(params, fsdp))
    return jax.device_put(params, shardings)


def batch_spec(extra: Optional[str] = None) -> P:
    return P(DATA_AXIS, extra) if extra else P(DATA_AXIS)


def token_sharded_spec() -> P:
    """(B, L, C) activations: batch on data, tokens on sp."""
    return P(DATA_AXIS, SP_AXIS, None)


def constrain(x, spec: P):
    """with_sharding_constraint that no-ops outside a mesh context.

    Spec axes absent from the active mesh degrade to None (replicated) so the
    model's canonical (data, sp, tp) layout hints stay valid on reduced
    meshes — e.g. the pipeline path's (data, pp) mesh. A spec axis whose
    dimension is NOT divisible by the mesh axis size also degrades to None:
    the degenerate-split guard (reference distributed.py:615-617 switches SP
    off for the call when a rank would get zero img tokens; here an odd
    token count simply stays replicated while everything else keeps its
    layout)."""
    from opensora_tpu.parallel.context import get_mesh

    mesh = get_mesh()
    if mesh is None:
        return x

    def keep(axis, dim):
        names = axis if isinstance(axis, tuple) else (axis,)
        if not all(n in mesh.shape for n in names):
            return False
        total = 1
        for n in names:
            total *= mesh.shape[n]
        return dim % total == 0

    spec = P(*(
        a if (a is None or keep(a, dim)) else None
        for a, dim in zip(spec, x.shape)
    ))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
