# Stage 1: 256px multi-bucket pretraining (reference configs/diffusion/train/stage1.py)
seed = 42
epochs = 100
lr = 1e-4
weight_decay = 0.0
adam_eps = 1e-8
warmup_steps = 1000
grad_clip = 1.0
accumulation_steps = 1
ema_decay = 0.9999
guidance = 4.0
seq_align = 1
log_every = 10
ckpt_every = 1000
keep_n_latest = 5
patch_size = 2

dropout_ratio = dict(t5=0.1, clip=0.1)

condition_config = dict(
    t2v=0.8,
    i2v_head=0.05,
    i2v_tail=0.05,
    i2v_loop=0.05,
    v2v_head=0.05,
)

mesh = dict(dp_size=-1, sp_size=1, tp_size=1)

dataset = dict(type="video_text", data_path="data/train_meta.csv")

bucket_config = {
    "256px": {1: (1.0, 50), 33: (1.0, 12), 65: (1.0, 6), 97: (1.0, 4), 129: (1.0, 3)},
}

model = dict(
    type="flux",
    in_channels=64,
    vec_in_dim=768,
    context_in_dim=4096,
    hidden_size=3072,
    mlp_ratio=4.0,
    num_heads=24,
    depth=19,
    depth_single_blocks=38,
    axes_dim=[16, 56, 56],
    theta=10_000,
    qkv_bias=True,
    guidance_embed=False,
    cond_embed=True,
    remat=True,
    remat_policy="dots",  # 6% faster than "full" at equal feasibility (NOTES_r1.md)
    dtype="bf16",
)

ae = dict(
    type="hunyuan_vae",
    in_channels=3,
    out_channels=3,
    latent_channels=16,
    dtype="bf16",
)

t5 = dict(type="text_embedder", from_pretrained="google/t5-v1_1-xxl", max_length=512)
clip = dict(type="text_embedder", from_pretrained="openai/clip-vit-large-patch14", max_length=77)
