# LoRA finetuning from the published 11B checkpoint (reference
# scripts/diffusion/train.py:198-217: peft LoraConfig via booster.enable_lora;
# EMA is disabled under LoRA like the reference).
#
# Only the (A, B) factor tree is trained/checkpointed; the base weights load
# once from `model.from_pretrained` and stay frozen.
_base_ = ["stage1.py"]

model = dict(from_pretrained="./ckpts/Open_Sora_v2.safetensors")
ae = dict(from_pretrained="./ckpts/hunyuan_vae.safetensors")

lora_config = dict(
    r=128,
    lora_alpha=128,
    # default targets: qkv/proj/linear1/linear2/mlp kernels
)

lr = 1e-4
warmup_steps = 100
