# HunyuanVideo VAE reconstruction eval
seed = 42
batch_size = 1
eval_setting = "33x256"
num_save = 4

dataset = dict(type="video_text", data_path="data/eval_meta.csv")

model = dict(
    type="hunyuan_vae",
    from_pretrained=None,
    latent_channels=16,
    use_spatial_tiling=True,
    dtype="bf16",
)
