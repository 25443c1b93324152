# Stage 2: 768px finetuning with sequence parallelism
# (reference configs/diffusion/train/stage2.py:6-104)
_base_ = ["stage1.py"]

lr = 5e-5
warmup_steps = 500

mesh = dict(dp_size=-1, sp_size=4, tp_size=1)
seq_align = 4

# long-sequence stage: "dots" remat OOMs at ≥8k tokens; "offload" matches
# "full" speed with lower recompute (NOTES_r1.md addendum 4)
model = dict(remat_policy="offload")

bucket_config = {
    "768px": {1: (0.5, 12), 33: (1.0, 6), 65: (1.0, 4), 97: (1.0, 3), 129: (1.0, 2)},
    "256px": {1: (0.3, 50), 129: (0.5, 3)},
}
