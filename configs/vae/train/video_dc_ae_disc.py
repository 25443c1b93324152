# Video DC-AE GAN phase (reference configs/vae/train/video_dc_ae_disc.py):
# discriminator active from step 0 with a fixed adversarial weight.
_base_ = ["video_dc_ae.py"]

gen_start = 0
disc_start = 0
disc_weight = 0.05
disc_loss_type = "hinge"
disc_lr = 1e-4
