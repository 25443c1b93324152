# DC-AE reconstruction eval (reference configs/vae/inference/video_dc_ae.py)
seed = 42
batch_size = 1
eval_setting = "32x256"
num_save = 4

dataset = dict(type="video_text", data_path="data/eval_meta.csv")

model = dict(
    type="dc_ae",
    model_name="dc-ae-f32t4c128",
    from_pretrained=None,
    use_spatial_tiling=True,
    use_temporal_tiling=True,
    dtype="bf16",
)
