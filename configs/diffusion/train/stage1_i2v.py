# Stage-1 i2v finetune (reference stage1_i2v.py): upweight image
# conditioning so the one model covers t2v + i2v head/tail/loop.
_base_ = ["stage1.py"]

lr = 1e-5

condition_config = dict(
    t2v=1,
    i2v_head=5,
    i2v_loop=1,
    i2v_tail=1,
)
