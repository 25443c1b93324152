# Single-chip serving, maximum-throughput experimental path: W8A8 dense
# matmuls PLUS int8-MXU attention (ops/int8_flash.py, SageAttention-style
# smoothed-K quantization with bf16 P.V — the "qk8" mode, measured the
# faster and tighter-error variant on v5e: 29.5 ms vs 31.9 ms bf16 per
# attention call at the 129f shape, ~0.9% on-chip rel L2 per call).
# Attention quantization error is bounded in tests/test_int8_flash.py but
# has NOT been validated on published weights — 256px_w8a8.py is the
# supported fast path; this config is for serving experiments.
_base_ = ["256px.py"]

model = dict(quantized="w8a8", attn_backend="int8_qk8")
