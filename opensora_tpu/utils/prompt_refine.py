"""Prompt refinement (behavioral reference: opensora/utils/prompt_refine.py:
7-234 — GPT-based rewriting with t2v/t2i/i2v system prompts and motion
scoring).

The reference calls the OpenAI API; in zero-egress environments refinement
degrades to identity (and motion scoring to a fixed mid score), keeping the
pipeline runnable. The system prompts are preserved so a networked deploy
gets the same behavior.
"""

from __future__ import annotations

import os
from typing import List

T2V_SYSTEM_PROMPT = (
    "You are a helpful assistant that rewrites user video prompts into "
    "detailed, cinematic descriptions. Describe the subject, motion, scene, "
    "lighting and camera work in one flowing paragraph. Keep all factual "
    "constraints from the user prompt; do not invent text overlays."
)

T2I_SYSTEM_PROMPT = (
    "You are a helpful assistant that rewrites user image prompts into "
    "detailed, photographic descriptions: subject, composition, lighting, "
    "lens and style, one paragraph."
)

I2V_SYSTEM_PROMPT = (
    "You are a helpful assistant that, given a description of a reference "
    "image, writes how the scene evolves over a short video clip: motion of "
    "the subject, camera movement, and scene dynamics, one paragraph."
)

MOTION_SCORE_PROMPT = (
    "Rate the amount of motion the following video description implies on a "
    "scale of 1 (static) to 10 (extremely dynamic). Reply with the number only."
)

_SYSTEM_PROMPTS = {
    "t2v": T2V_SYSTEM_PROMPT,
    "t2i": T2I_SYSTEM_PROMPT,
    "i2v": I2V_SYSTEM_PROMPT,
    "motion_score": MOTION_SCORE_PROMPT,
}


def _call_llm(system: str, user: str) -> str | None:
    """OpenAI-compatible chat call; None when unavailable (offline)."""
    api_key = os.environ.get("OPENAI_API_KEY")
    if not api_key:
        return None
    try:
        import json
        import urllib.request

        base = os.environ.get("OPENAI_BASE_URL", "https://api.openai.com/v1")
        req = urllib.request.Request(
            f"{base}/chat/completions",
            data=json.dumps(
                {
                    "model": os.environ.get("OPENAI_MODEL", "gpt-4o-mini"),
                    "messages": [
                        {"role": "system", "content": system},
                        {"role": "user", "content": user},
                    ],
                }
            ).encode(),
            headers={
                "Authorization": f"Bearer {api_key}",
                "Content-Type": "application/json",
            },
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            out = json.load(r)
        return out["choices"][0]["message"]["content"].strip()
    except Exception:
        return None


def refine_prompt(prompt: str, type: str = "t2v") -> str:
    out = _call_llm(_SYSTEM_PROMPTS[type], prompt)
    return out if out else prompt


def refine_prompts(prompts: List[str], type: str = "t2v") -> List[str]:
    if type == "motion_score":
        scores = []
        for p in prompts:
            out = _call_llm(MOTION_SCORE_PROMPT, p)
            try:
                scores.append(f"{int(out)} motion score")
            except (TypeError, ValueError):
                scores.append("5 motion score")
        return scores
    return [refine_prompt(p, type) for p in prompts]
