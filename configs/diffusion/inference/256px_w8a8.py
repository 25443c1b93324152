# Single-chip serving, fastest path: int8 weights + dynamic int8 activations
# (W8A8, ops/quant.py). The block matmuls run on the v5e int8 MXU path at
# ~2x the bf16 MAC rate — measured 3.38 s/step vs 4.18 s/step weight-only at
# the reference 129f shape (NOTES_r1.md). Activation quantization adds ~1e-2
# relative error per matmul; validate output quality on your prompts before
# production use (weight-only 256px_int8.py is the conservative default).
_base_ = ["256px.py"]

model = dict(quantized="w8a8")
