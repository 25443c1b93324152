"""Inference conditioning masks (reference utils/inference.py:283-351) and
prompt suffix utilities."""

import jax.numpy as jnp
import numpy as np
import pytest

from opensora_tpu.utils.inference import (
    add_fps_info_to_text,
    add_motion_score_to_text,
    prepare_inference_condition,
)


def _z(B=2, C=4, T=8, H=4, W=4):
    return jnp.zeros((B, C, T, H, W))


def _refs(B, C, T, H, W, n=2):
    rng = np.random.default_rng(0)
    return [
        [jnp.asarray(rng.normal(size=(C, T, H, W)), jnp.float32) for _ in range(n)]
        for _ in range(B)
    ]


def test_t2v_no_masks():
    z = _z()
    masks, masked = prepare_inference_condition(z, "t2v", None)
    assert float(jnp.abs(masks).max()) == 0
    assert float(jnp.abs(masked).max()) == 0


@pytest.mark.parametrize("cond,frames", [
    ("i2v_head", [0]),
    ("i2v_tail", [-1]),
    ("i2v_loop", [0, -1]),
])
def test_i2v_masks(cond, frames):
    z = _z()
    refs = _refs(2, 4, 8, 4, 4)
    masks, masked = prepare_inference_condition(z, cond, refs, causal=True)
    m = np.asarray(masks)
    on = np.zeros(8, bool)
    for f in frames:
        on[f] = True
    for t in range(8):
        expect = 1.0 if on[t] else 0.0
        assert float(m[:, :, t].max()) == expect
        assert float(m[:, :, t].min()) == expect
    # masked latent nonzero only on conditioned frames
    mz = np.asarray(masked)
    for t in range(8):
        if not on[t]:
            assert np.abs(mz[:, :, t]).max() == 0


@pytest.mark.parametrize("cond,k_causal", [("v2v_head", 9), ("v2v_tail", 9)])
def test_v2v_masks(cond, k_causal):
    T = 16
    z = _z(T=T)
    refs = _refs(2, 4, T, 4, 4)
    masks, _ = prepare_inference_condition(z, cond, refs, causal=True)
    m = np.asarray(masks)
    assert int(m[0, 0, :, 0, 0].sum()) == k_causal  # 8 + causal
    masks_nc, _ = prepare_inference_condition(z, cond, refs, causal=False)
    assert int(np.asarray(masks_nc)[0, 0, :, 0, 0].sum()) == 8


def test_prompt_suffixes():
    out = add_fps_info_to_text(["a cat", "a dog. 16 FPS."])
    assert out[0] == "a cat. 16 FPS."
    assert out[1] == "a dog. 16 FPS."  # not doubled
    out = add_motion_score_to_text(["a cat."], 7)
    assert out[0].endswith("7 motion score.")
