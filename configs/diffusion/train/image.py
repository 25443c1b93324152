# Image pretraining base (reference configs/diffusion/train/image.py):
# single-frame buckets across 256/768/1024px; the video stages inherit
# the full model/ae/text wiring from stage1 instead — this config is the
# standalone image-stage entry point.
_base_ = ["stage1.py"]

lr = 1e-5
warmup_steps = 0

condition_config = dict(t2v=1.0)

bucket_config = {
    "_delete_": True,
    "256px": {1: (1.0, 50)},
    "768px": {1: (0.5, 11)},
    "1024px": {1: (0.5, 7)},
}
