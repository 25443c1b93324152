"""Global batch assembly: per-host numpy batches → mesh-placed jax.Arrays.

The reference's DP dataloading is per-rank (each rank loads its own slice,
reference opensora/datasets/dataloader.py:250-261). The JAX equivalent for
multi-host pods is ``jax.make_array_from_process_local_data``: every host
feeds its local rows and the result is one global array laid out over the
mesh — batch rows on 'data', token dims on 'sp' (SURVEY.md §2.6 DP row).

On a single host this reduces to an explicit ``device_put`` with the same
NamedSharding, so token placement on 'sp' is deterministic rather than left
to GSPMD resharding inside the jitted step.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opensora_tpu.parallel.mesh import DATA_AXIS, SP_AXIS

# batch entries whose dim 1 is the token axis (sharded over 'sp')
TOKEN_KEYS = frozenset(
    {"x0", "img_ids", "txt", "txt_ids", "cond", "null_txt"}
)


def batch_sharding(mesh: Mesh, key: str, shape) -> NamedSharding:
    """NamedSharding for one batch entry: rows on 'data'; token dim on 'sp'
    when the key is a token tensor and its length divides the sp axis
    (seq_align guarantees this for txt; img tokens fall back to replicated
    tokens otherwise — correct, just less sharded)."""
    sp = mesh.shape.get(SP_AXIS, 0)  # 0: no sp axis (e.g. a (data, pp) mesh)
    ndim = len(shape)
    if key in TOKEN_KEYS and ndim >= 2 and sp and shape[1] % sp == 0:
        return NamedSharding(mesh, P(DATA_AXIS, SP_AXIS, *([None] * (ndim - 2))))
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def make_global_batch(
    mesh: Mesh, batch: Dict[str, Optional[np.ndarray]]
) -> Dict[str, Optional[jax.Array]]:
    """Place a per-host batch dict onto the mesh.

    Multi-host: each entry is this host's local rows; the global batch is
    the concatenation over processes along 'data'
    (jax.make_array_from_process_local_data). Single-host: device_put with
    the same shardings (mirrors __graft_entry__'s dryrun placement).
    """
    multi = jax.process_count() > 1
    dp = mesh.shape[DATA_AXIS]
    out: Dict[str, Optional[jax.Array]] = {}
    for key, val in batch.items():
        if val is None:
            out[key] = None
            continue
        b_global = val.shape[0] * (jax.process_count() if multi else 1)
        if b_global % dp != 0:
            raise ValueError(
                f"global batch {b_global} (key {key!r}) not divisible by the "
                f"mesh 'data' axis ({dp}); set each bucket's batch size to a "
                f"multiple of dp (configs bucket_config) or shrink dp_size"
            )
        sharding = batch_sharding(mesh, key, val.shape)
        if multi:
            # requires host-local numpy rows (device arrays are host-fetched;
            # the loader feeds numpy in the multi-host path)
            out[key] = jax.make_array_from_process_local_data(
                sharding, np.asarray(val)
            )
        else:
            # device arrays (e.g. AE latents) reshard device-side, no host trip
            out[key] = jax.device_put(val, sharding)
    return out
