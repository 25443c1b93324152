# 256px with tensor-parallel weights (reference 256px_tp.py):
# compose the base pipeline with the TP plugin mesh.
_base_ = ["256px.py", "plugins/tp.py"]
