# Tensor-parallel inference (reference plugins/tp.py): qkv/proj/MLP weights
# sharded over the 'tp' mesh axis.
mesh = dict(dp_size=1, sp_size=1, tp_size=-1)
