# t2i2v plugin (reference plugins/t2i2v.py): the distilled flux image
# stage + its 2D AE, shared by t2i2v_256px / t2i2v_768px.
use_t2i2v = True

img_flux = dict(
    type="flux",
    from_pretrained=None,  # flux1-dev.safetensors
    # flux1-dev is ORIGINAL-Flux-trained: interleaved RoPE pairing
    # (reference model.py:59 use_liger_rope defaults False and the t2i2v
    # plugin does not override it — unlike the video model, 256px.py:41).
    # The converter must permute q/k channels into our split layout.
    ckpt_rope_convention="interleaved",
    guidance_embed=True,
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
    dtype="bf16",
)
img_flux_ae = dict(
    type="autoencoder_2d",
    from_pretrained=None,  # flux ae.safetensors
    ch=128,
    ch_mult=[1, 2, 4, 4],
    num_res_blocks=2,
    z_channels=16,
    scale_factor=0.3611,
    shift_factor=0.1159,
    dtype="bf16",
)

img_resolution = "768px"
sampling_option_t2i = dict(
    resolution="768px",
    aspect_ratio="1:1",
    num_frames=1,
    num_steps=50,
    guidance=4.0,
    method="distill",
)
