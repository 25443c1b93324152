# text → image (flux distilled) → 768px video (reference t2i2v_768px.py).
_base_ = ["768px.py", "plugins/t2i2v.py"]

cond_type = "i2v_head"
