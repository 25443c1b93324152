# text → image (flux distilled) → video (reference t2i2v_256px.py).
_base_ = ["256px.py", "plugins/t2i2v.py"]

cond_type = "i2v_head"
