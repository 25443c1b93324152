# Tiny random-weight config: smoke-tests the full CLI path on any device.
save_dir = "samples"
seed = 42
batch_size = 1
dtype = "fp32"
cond_type = "t2v"
fps_save = 8

sampling_option = dict(
    height=32,
    width=32,
    num_frames=5,
    num_steps=2,
    guidance=4.0,
    guidance_img=1.0,
    is_causal_vae=True,
    temporal_reduction=4,  # match the hunyuan VAE's time compression
    method="i2v",
    seed=0,
)

dataset = dict(type="text")

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
    guidance_embed=True,
    cond_embed=True,
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
