"""VAE context/tensor parallelism, the TPU way.

The reference shards the VAE with hand-written channel-TP convs and a ring
attention over sequence strips (opensora/models/hunyuan_vae/distributed.py
:76-392, policy.py:13-155, models/vae/tensor_parallel.py:27-558 —
Conv3dTPCol/Row, GroupNormTP, MemEfficientRingAttention with per-rank causal
bias blocks).

On TPU none of that machinery is needed: the VAE runs under jit with its
*height* dimension sharded over the 'sp' mesh axis. XLA/GSPMD inserts halo
exchanges for the convolutions and gathers the (single) mid-block attention
— the exact communication the reference implements by hand with NCCL. The
causal mid-block mask is computed in-kernel (ops/flash_attention.py), so no
per-rank bias strips exist to begin with.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opensora_tpu.parallel.mesh import DATA_AXIS, SP_AXIS


def vae_input_sharding(mesh: Mesh) -> NamedSharding:
    """(B, C, T, H, W): batch on data, height on sp."""
    return NamedSharding(mesh, P(DATA_AXIS, None, None, SP_AXIS, None))


def vae_latent_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS, None, None, SP_AXIS, None))


def make_sharded_vae_fn(vae, variables, mesh: Mesh, method=None, rngs_name: Optional[str] = "gaussian"):
    """jit a VAE encode/decode over the mesh with spatially-sharded IO.

    Returns fn(x, rng) for encode-like methods (rngs required) or fn(x) for
    decode-like (pass rng=None)."""
    in_shard = vae_input_sharding(mesh)
    out_shard = vae_latent_sharding(mesh)

    if rngs_name:
        def fn(x, rng):
            return vae.apply(variables, x, rngs={rngs_name: rng}, method=method)

        return jax.jit(fn, in_shardings=(in_shard, None), out_shardings=out_shard)

    def fn(x):
        return vae.apply(variables, x, method=method)

    return jax.jit(fn, in_shardings=(in_shard,), out_shardings=out_shard)
