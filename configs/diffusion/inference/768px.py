# 768px generation (reference configs/diffusion/inference/768px.py):
# same 11B model, higher resolution, ae spatial tiling on.
_base_ = ["256px.py"]

sampling_option = dict(
    resolution="768px",
    aspect_ratio="16:9",
    num_frames=129,
    num_steps=50,
)
# SP over all chips for the 45k-token sequence
mesh = dict(dp_size=1, sp_size=-1, tp_size=1)
