"""Capture a torch-reference forward fixture for verify_pretrained --ref-npz.

Runs the REFERENCE'S OWN MMDiT (from /root/reference, CUDA deps shimmed to
CPU — tests/ref_shim.py) on a real checkpoint with verify_pretrained's
deterministic inputs, and writes the expected output as an .npz. Completes
the real-weights parity gate end-to-end:

    python scripts/cnv/capture_ref_fixture.py ckpts/Open_Sora_v2.safetensors ref_io.npz
    python scripts/cnv/verify_pretrained.py mmdit ckpts/Open_Sora_v2.safetensors \
        --ref-npz ref_io.npz

The same flow runs with random weights in tests/test_ref_parity.py::
test_published_wiring_flagship_geometry — this CLI is the real-checkpoint
instantiation. Published wiring: fused_qkv=False, use_liger_rope=True
(reference configs/diffusion/inference/256px.py:40-41).
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# This is a host-side torch-oracle tool; the only jax it touches is the
# trivial build_img_ids inside mmdit_fixture_inputs. Force the CPU backend
# so the capture never blocks on (or competes with) TPU availability —
# under out-of-tree plugins the env var alone is ignored, hence both.
os.environ["JAX_PLATFORMS"] = "cpu"
from opensora_tpu.utils.config import apply_jax_platform_env  # noqa: E402

apply_jax_platform_env()


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("checkpoint", help="torch-layout .safetensors")
    p.add_argument("out", help="output .npz path")
    p.add_argument("--fused-qkv", action="store_true",
                   help="checkpoint uses the fused qkv/linear1 layout "
                        "(published Open-Sora-v2 files are UNFUSED)")
    p.add_argument("--interleaved-rope", action="store_true",
                   help="checkpoint was trained with the Flux interleaved "
                        "RoPE (published files are liger/rotate-half)")
    args = p.parse_args()

    import numpy as np
    import torch

    from ref_shim import import_reference_mmdit

    ref_model, _, _ = import_reference_mmdit()

    from safetensors import safe_open

    with safe_open(args.checkpoint, framework="pt") as f:
        sd = {k: f.get_tensor(k).float() for k in f.keys()}

    qkv_key = "qkv" if args.fused_qkv else "q_proj"
    depth = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("double_blocks."))
    depth_s = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("single_blocks."))
    hidden = sd["img_in.weight"].shape[0]
    in_ch = sd["img_in.weight"].shape[1]
    ctx = sd["txt_in.weight"].shape[1]
    vec = sd["vector_in.in_layer.weight"].shape[1]
    cond = "cond_in.weight" in sd
    guid = "guidance_in.in_layer.weight" in sd
    head_dim = sd["double_blocks.0.img_attn.norm.query_norm.scale"].shape[0]
    heads = hidden // head_dim
    mlp_ratio = sd["double_blocks.0.img_mlp.0.weight"].shape[0] / hidden
    qkv_bias = f"double_blocks.0.img_attn.{qkv_key}.bias" in sd

    cfg = ref_model.MMDiTConfig(
        from_pretrained=None, cache_dir=None, in_channels=in_ch,
        vec_in_dim=vec, context_in_dim=ctx, hidden_size=hidden,
        mlp_ratio=mlp_ratio, num_heads=heads, depth=depth,
        depth_single_blocks=depth_s,
        axes_dim=[16, 56, 56] if head_dim == 128 else
        [head_dim // 4, 3 * head_dim // 8, 3 * head_dim // 8],
        theta=10_000, qkv_bias=qkv_bias, guidance_embed=guid,
        cond_embed=cond, fused_qkv=args.fused_qkv,
        use_liger_rope=not args.interleaved_rope,
    )
    net = ref_model.MMDiTModel(cfg).float().eval()
    missing, unexpected = net.load_state_dict(sd, strict=False)
    if missing or unexpected:
        print(f"missing={missing[:5]} unexpected={unexpected[:5]}",
              file=sys.stderr)

    from verify_pretrained import mmdit_fixture_inputs  # same directory

    inputs = mmdit_fixture_inputs(in_ch, ctx, vec, cond, guid)
    # keep None placeholders in position: dropping them would shift
    # guidance into the cond slot for guidance_embed-only checkpoints
    # (flux1-dev: cond=False, guid=True)
    with torch.no_grad():
        expected = net(*[
            None if a is None else torch.from_numpy(np.asarray(a, np.float32))
            for a in inputs
        ]).numpy()
    np.savez(args.out, expected=expected)
    print(f"wrote {args.out}: expected {expected.shape} "
          f"(depth {depth}+{depth_s}, hidden {hidden}, "
          f"fused={args.fused_qkv}, liger={not args.interleaved_rope})")


if __name__ == "__main__":
    main()
