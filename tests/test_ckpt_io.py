"""CheckpointIO: orbax save → load roundtrip with running/sampler state,
and keep_n_latest GC (reference utils/ckpt.py:143-169, 335-524)."""

import jax
import jax.numpy as jnp
import numpy as np
import os

from opensora_tpu.training.diffusion import TrainState
from opensora_tpu.utils.ckpt import CheckpointIO
from opensora_tpu.utils.optimizer import create_optimizer


def _state(seed):
    params = {
        "w": jax.random.normal(jax.random.PRNGKey(seed), (4, 4)),
        "b": jnp.zeros((4,)),
    }
    tx = create_optimizer(lr=1e-3)
    return TrainState.create(params, tx, ema=True), tx


def test_save_load_roundtrip(tmp_path):
    state, _ = _state(0)
    io = CheckpointIO()
    d = io.save(
        str(tmp_path), state, epoch=1, step=7, global_step=107,
        sampler_state={"last_micro_batch_access_index": 14},
        async_io=False,
    )
    io.wait()

    template, _ = _state(1)  # different values, same structure
    restored, running, sampler_state = io.load(d, template)
    assert running == {"epoch": 1, "step": 7, "global_step": 107}
    assert sampler_state == {"last_micro_batch_access_index": 14}
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(restored.ema_params), jax.tree.leaves(state.ema_params)
    ):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_keep_n_latest_gc(tmp_path):
    state, _ = _state(0)
    io = CheckpointIO()
    for g in (10, 20, 30, 40):
        io.save(str(tmp_path), state, epoch=0, step=g, global_step=g, async_io=False)
    io.wait()
    io.save(str(tmp_path), state, epoch=0, step=50, global_step=50,
            keep_n_latest=2, async_io=False)
    io.wait()
    kept = sorted(d for d in os.listdir(tmp_path) if d.startswith("epoch"))
    assert kept == ["epoch0-global_step40", "epoch0-global_step50"]
