# High-compression training (reference configs/diffusion/train/
# high_compression.py): Video DC-AE latents (128 ch, 32x spatial,
# patch_size 1), i2v-heavy conditioning.
_base_ = ["stage1.py"]

lr = 3e-5
ckpt_every = 250
patch_size = 1
ae_spatial_compression = 32

condition_config = dict(
    t2v=1,
    i2v_head=7,
)

model = dict(
    in_channels=128,
    patch_size=1,
    cond_embed=True,
)

ae = dict(
    _delete_=True,
    type="dc_ae",
    model_name="dc-ae-f32t4c128",
    from_pretrained=None,  # F32T4C128_AE.safetensors
    use_spatial_tiling=True,
    use_temporal_tiling=True,
    dtype="bf16",
)
is_causal_vae = False
