"""Gradio web demo (behavioral reference: gradio/app.py — prompt box,
resolution/length/seed controls, generate button → mp4 player).

Requires ``pip install gradio`` (not baked into TPU images); the module
degrades to a clear error message otherwise.

Usage: python gradio/app.py configs/diffusion/inference/256px.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_demo(cfg_path: str):
    try:
        import gradio as gr
    except ImportError:
        gr = None
    # this repo's own gradio/ package dir shadows an absent install as an
    # empty namespace package, so check for the real API, not just import
    if gr is None or not hasattr(gr, "Blocks"):
        raise SystemExit(
            "gradio is not installed in this image; run `pip install gradio` "
            "on a networked host to serve the demo"
        )

    import numpy as np

    from opensora_tpu.utils.api import prepare_api, prepare_models
    from opensora_tpu.utils.config import load_config
    from opensora_tpu.utils.inference import add_fps_info_to_text, save_sample
    from opensora_tpu.utils.sampling import SamplingOption, sanitize_sampling_option
    import opensora_tpu.models.mmdit  # noqa: F401
    import opensora_tpu.models.hunyuan_vae  # noqa: F401
    import opensora_tpu.models.text.conditioner  # noqa: F401

    cfg = load_config(cfg_path)
    model, ae, t5, clip, optional = prepare_models(cfg, dtype=cfg.get("dtype", "bf16"))
    api_fn = prepare_api(model, ae, t5, clip, optional)

    def generate(prompt, resolution, aspect_ratio, num_frames, num_steps,
                 guidance, seed, motion_score, refine):
        from opensora_tpu.utils.inference import add_motion_score_to_text
        from opensora_tpu.utils.prompt_refine import refine_prompts

        opt = sanitize_sampling_option(
            SamplingOption(
                resolution=resolution, aspect_ratio=aspect_ratio,
                num_frames=int(num_frames), num_steps=int(num_steps),
                guidance=float(guidance), guidance_img=3.0,
                is_causal_vae=True, temporal_reduction=4,
                seed=int(seed) if seed else None,
            )
        )
        text = [prompt]
        if refine:  # GPT-backed in the reference; identity offline
            text = refine_prompts(text, type="t2v")
        if int(motion_score) > 0:
            text = add_motion_score_to_text(text, int(motion_score))
        text = add_fps_info_to_text(text)
        x = np.asarray(api_fn(opt, text=text, channel=cfg["model"]["in_channels"]))
        out = save_sample(x[0], "/tmp/gradio_sample", fps=16)
        return out

    with gr.Blocks(title="opensora_tpu") as demo:
        gr.Markdown("# opensora_tpu — text-to-video on TPU")
        prompt = gr.Textbox(label="Prompt", value="a cat playing piano")
        with gr.Row():
            resolution = gr.Dropdown(["256px", "768px"], value="256px", label="Resolution")
            aspect = gr.Dropdown(["16:9", "9:16", "1:1", "2.39:1"], value="16:9", label="Aspect")
            frames = gr.Slider(1, 129, value=33, step=4, label="Frames")
        with gr.Row():
            steps = gr.Slider(10, 50, value=50, step=1, label="Steps")
            guidance = gr.Slider(1.0, 10.0, value=7.5, label="Guidance")
            seed = gr.Number(value=42, label="Seed")
        with gr.Row():
            motion = gr.Slider(
                0, 7, value=4, step=1,
                label="Motion score (0 = off)",
            )
            refine = gr.Checkbox(
                value=False,
                label="Refine prompt (identity offline)",
            )
        btn = gr.Button("Generate")
        video = gr.Video(label="Result")
        btn.click(
            generate,
            [prompt, resolution, aspect, frames, steps, guidance, seed,
             motion, refine],
            video,
        )
    return demo


if __name__ == "__main__":
    demo = build_demo(sys.argv[1])
    if "--check" in sys.argv:
        # build-only smoke (CI / headless hosts): models loaded, UI graph
        # constructed, no server bound
        print("gradio demo built OK")
    else:
        demo.launch(server_name="0.0.0.0")
