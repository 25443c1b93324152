# DC-AE high-compression variant (reference high_compression.py):
# patch_size 1, 128-ch latents, 32x spatial AE.
_base_ = ["256px.py"]

patch_size = 1
ae_spatial_compression = 32

model = dict(
    in_channels=128,
    patch_size=1,
    cond_embed=True,
)

ae = dict(
    _delete_=True,
    type="dc_ae",
    model_name="dc-ae-f32t4c128",
    from_pretrained=None,
    use_spatial_tiling=True,
    use_temporal_tiling=True,
    dtype="bf16",
)

sampling_option = dict(
    temporal_reduction=4,
    is_causal_vae=False,
)
