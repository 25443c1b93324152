# Tiny debug config (reference configs/diffusion/train/demo.py): small model,
# one small bucket, runs on CPU or a single chip.
seed = 42
epochs = 1
lr = 1e-4
log_every = 1
ckpt_every = 50
ema_decay = 0.9999
guidance = 4.0
patch_size = 2

dropout_ratio = dict(t5=0.1, clip=0.1)
mesh = dict(dp_size=-1, sp_size=1, tp_size=1)

dataset = dict(type="video_text", data_path="data/demo_meta.csv")
bucket_config = {
    "64px": {1: (1.0, 2), 5: (1.0, 2)},
}

model = dict(
    type="flux",
    in_channels=16,
    vec_in_dim=32,
    context_in_dim=64,
    hidden_size=64,
    mlp_ratio=2.0,
    num_heads=2,
    depth=1,
    depth_single_blocks=1,
    axes_dim=[8, 12, 12],
    qkv_bias=True,
    guidance_embed=False,
    cond_embed=False,
    attn_backend="xla",
    dtype="fp32",
)

ae = dict(
    type="hunyuan_vae",
    block_out_channels=[8, 8, 8, 8],
    latent_channels=4,
    norm_num_groups=4,
    layers_per_block=1,
    dtype="fp32",
)

t5 = dict(type="text_embedder", from_pretrained="", max_length=16, _tiny=True)
clip = dict(type="text_embedder", from_pretrained="clip-tiny", max_length=16, _tiny=True)
