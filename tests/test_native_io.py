"""Native async writer + safetensors export (csrc/async_writer.cpp)."""

import os

import numpy as np

from opensora_tpu.utils.native_io import (
    AsyncFileWriter,
    save_safetensors_async,
)


def test_async_writer_roundtrip(tmp_path):
    path = str(tmp_path / "buf.bin")
    with AsyncFileWriter(path) as w:
        for i in range(10):
            w.write_array(np.full((1024,), i, np.float32), i * 4096)
        w.flush()
    data = np.fromfile(path, np.float32)
    for i in range(10):
        assert data[i * 1024] == i


def test_safetensors_export_roundtrip(tmp_path):
    from safetensors import safe_open

    tensors = {
        "a": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b": np.ones((5,), np.int64),
    }
    path = str(tmp_path / "t.safetensors")
    save_safetensors_async(tensors, path)
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            assert np.array_equal(f.get_tensor(k), tensors[k])


def test_safetensors_bf16_export(tmp_path):
    import jax.numpy as jnp
    from safetensors import safe_open

    t = {"w": np.asarray(jnp.ones((4, 4), jnp.bfloat16))}
    path = str(tmp_path / "bf16.safetensors")
    save_safetensors_async(t, path)
    with safe_open(path, framework="np") as f:
        got = f.get_tensor("w")
        assert str(got.dtype) == "bfloat16"
        assert np.allclose(np.asarray(got, np.float32), 1.0)
