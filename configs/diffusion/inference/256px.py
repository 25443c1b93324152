# Flagship 11B t2v/i2v at 256px (reference configs/diffusion/inference/256px.py)
save_dir = "samples"
seed = 42
batch_size = 1
dtype = "bf16"
cond_type = "t2v"
fps_save = 16

sampling_option = dict(
    resolution="256px",
    aspect_ratio="16:9",
    num_frames=129,
    num_steps=50,
    shift=True,
    temporal_reduction=4,
    is_causal_vae=True,
    guidance=7.5,
    guidance_img=3.0,
    text_osci=True,
    image_osci=True,
    scale_temporal_osci=True,
    method="i2v",
    seed=None,
)
dataset = dict(type="text", fps=16, motion_score="4")

model = dict(
    type="flux",
    from_pretrained=None,  # set to Open_Sora_v2.safetensors for real weights
    guidance_embed=False,
    fused_qkv=True,
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
    cond_embed=True,
    dtype="bf16",
)

ae = dict(
    type="hunyuan_vae",
    from_pretrained=None,  # hunyuan_vae.safetensors
    in_channels=3,
    out_channels=3,
    latent_channels=16,
    use_spatial_tiling=True,
    use_temporal_tiling=False,
    dtype="bf16",
)

t5 = dict(
    type="text_embedder",
    from_pretrained="google/t5-v1_1-xxl",
    max_length=512,
)
clip = dict(
    type="text_embedder",
    from_pretrained="openai/clip-vit-large-patch14",
    max_length=77,
)
