# Single-chip serving: full 11B with int8 weight-only quantized blocks
# (ops/quant.py). 11.2 GiB of weights fit one 16 GiB v5e chip — no TP or
# host offload needed (the reference's 1-GPU path needs both,
# README.md:281-288). Quantize published weights once with
# opensora_tpu.ops.quant.quantize_params after loading.
_base_ = ["256px.py"]

model = dict(quantized=True)
