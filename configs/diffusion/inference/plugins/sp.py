# Sequence-parallel inference over all chips (reference plugins/sp.py):
# ring attention over the 'sp' mesh axis.
mesh = dict(dp_size=1, sp_size=-1, tp_size=1)
model = dict(attn_backend="ring")
seq_align = 8
