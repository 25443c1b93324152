# 768px/129f single-chip serving on the MEASURED faster attention path:
# the anchored int8-qk8 Pallas kernel (ops/int8_flash.py) wins 1.13-1.32x
# over the bf16 kernel at this shape across three sessions (bench
# step_time_768px_int8qk8_s vs step_time_768px_s). Reported
# headline-adjacent, NOT the default: the real-weights quality criteria
# 1-2 in docs/inference.md remain env-blocked — this config is the
# one-flag opt-in the round-5 amendment names.
_base_ = ["768px_1chip.py"]

model = dict(attn_backend="int8_qk8")
