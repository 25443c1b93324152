"""Timers, profiling, memory telemetry, dtype policy.

TPU-native analogue of the reference's utils/misc.py (Timers, NsysProfiler,
memory logging): jax.profiler traces replace nsys/NVTX ranges, device memory
stats replace torch.cuda introspection.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax
import jax.numpy as jnp

DTYPE_MAP = {
    "fp32": jnp.float32,
    "float32": jnp.float32,
    "bf16": jnp.bfloat16,
    "bfloat16": jnp.bfloat16,
    "fp16": jnp.float16,
    "float16": jnp.float16,
}


def to_jax_dtype(dtype) -> jnp.dtype:
    if isinstance(dtype, str):
        return DTYPE_MAP[dtype]
    return dtype


class Timer:
    """Wall-clock section timer (reference utils/misc.py:259-312).

    ``block=True`` waits for device work to flush before reading the clock,
    the SPMD analogue of the reference's optional dist.barrier.
    """

    def __init__(self, name: str, block: bool = False):
        self.name = name
        self.block = block
        self.elapsed = 0.0
        self.count = 0
        self._t0 = None

    def __enter__(self):
        if self.block:
            jax.effects_barrier()
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.block:
            jax.effects_barrier()
        self.elapsed += time.perf_counter() - self._t0
        self.count += 1
        return False

    @property
    def average(self) -> float:
        return self.elapsed / max(self.count, 1)


class Timers:
    """A named collection of timers exported into logging dicts."""

    def __init__(self, block: bool = False):
        self._timers: Dict[str, Timer] = {}
        self.block = block

    def __call__(self, name: str) -> Timer:
        if name not in self._timers:
            self._timers[name] = Timer(name, block=self.block)
        return self._timers[name]

    def to_dict(self, reset: bool = True) -> Dict[str, float]:
        out = {f"time/{k}": t.average for k, t in self._timers.items() if t.count}
        if reset:
            for t in self._timers.values():
                t.elapsed = 0.0
                t.count = 0
        return out


@contextlib.contextmanager
def profiler_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace window — the nsys/torch.profiler equivalent."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def named_scope(name: str):
    """Annotate a trace section (NVTX-range analogue)."""
    return jax.named_scope(name)


def log_device_memory(tag: str = "", logger=None) -> Dict[str, float]:
    """Device HBM usage per local device, in GB."""
    stats = {}
    for d in jax.local_devices():
        try:
            m = d.memory_stats()
        except Exception:
            continue
        if m:
            stats[str(d.id)] = {
                "bytes_in_use_gb": m.get("bytes_in_use", 0) / 2**30,
                "peak_bytes_gb": m.get("peak_bytes_in_use", 0) / 2**30,
            }
    if logger is not None:
        logger.info("[mem]%s %s", f" {tag}" if tag else "", stats)
    return stats


def count_params(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


def format_numel(n: int) -> str:
    for unit, div in (("B", 1e9), ("M", 1e6), ("K", 1e3)):
        if n >= div:
            return f"{n / div:.2f} {unit}"
    return str(n)
