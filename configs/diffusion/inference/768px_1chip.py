# 768px/129f serving on ONE 16 GiB chip (no reference equivalent — the
# reference needs CPU offload or 8-GPU SP at this shape, README.md:283-288).
# Three levers compose (docs/inference.md):
#   - w8a8_pallas: int8 weights+activations, fused Pallas matmul whose int32
#     accumulators stay in VMEM (ops/int8_matmul.py)
#   - seq_chunks=16: sequence-chunked block compute — one MLP chunk's
#     activations live at a time (models/mmdit/layers.py:_seq_chunked)
#   - cfg_batched=False: the 3-way CFG runs as three sequential B=1 passes
#     per step (utils/sampling.py)
# AOT-verified: 3.9 GiB temps + 11.2 GiB weights < 15.75 GiB HBM.
_base_ = ["768px.py"]

model = dict(quantized="w8a8_pallas", seq_chunks=16)
sampling_option = dict(cfg_batched=False)
mesh = None  # single chip
