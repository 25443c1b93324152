# Stage-2 (768px) i2v finetune (reference stage2_i2v.py).
_base_ = ["stage2.py"]

condition_config = dict(
    t2v=1,
    i2v_head=5,
    i2v_loop=1,
    i2v_tail=1,
)
