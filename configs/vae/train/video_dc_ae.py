# Video DC-AE training (reference configs/vae/train/video_dc_ae*.py):
# 256px 32-frame buckets, GAN phase with 3D discriminator.
seed = 42
epochs = 100
lr = 1e-5
disc_lr = 1e-5
log_every = 10
ckpt_every = 2000
kl_loss_weight = 0.0  # DC-AE has no KL
gen_start = 2001
disc_start = 2001
disc_loss_type = "hinge"

dataset = dict(type="video_text", data_path="data/train_meta.csv")
bucket_config = {
    "256px_ar1:1": {32: (1.0, 1), 1: (1.0, 4)},
}

model = dict(
    type="dc_ae",
    model_name="dc-ae-f32t4c128",
    is_training=True,
    dtype="bf16",
)

discriminator = dict(
    type="N_Layer_discriminator_3D",
    input_nc=3,
    ndf=64,
    n_layers=5,
)

# set to a local torchvision vgg16 checkpoint to enable LPIPS
vgg_ckpt = None
lpips_ckpt = None
