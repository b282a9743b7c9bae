"""Position-conditioned text embeddings for generative 3D guidance.

Reference: `nerfstudio/generative/positional_text_embeddings.py` — the
DreamFusion trick of swapping/blending "front/side/back/top view of ..."
prompts by camera angle. Pure array math over precomputed embeddings, so it
works with any backbone (or plain test arrays) and jits."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


class PositionalTextEmbeddings:
    """Select or blend view-dependent prompt embeddings.

    embeds: dict with keys base/top/side/back/front, each [2, L, D] (uncond,
    cond) — precomputed via `StableDiffusionGuidance.get_text_embeds` (or any
    array for tests). Modes (`positional_text_embeddings.py:29-35`):
    discrete (nearest view prompt), interpolated (angular blend), off (base).
    """

    def __init__(self, embeds: Dict[str, jnp.ndarray], positional_prompting: str = "discrete"):
        required = {"base", "top", "side", "back", "front"}
        missing = required - set(embeds)
        if missing:
            raise ValueError(f"missing prompt embeddings: {sorted(missing)}")
        self.embeds = {k: jnp.asarray(v) for k, v in embeds.items()}
        if positional_prompting not in ("discrete", "interpolated", "off"):
            raise ValueError(f"unknown positional_prompting {positional_prompting!r}")
        self.positional_prompting = positional_prompting

    def __call__(self, vertical_angle: float, horizontal_angle: float) -> jnp.ndarray:
        """Embedding for a camera at (vertical, horizontal) degrees
        (`positional_text_embeddings.py:78-121`)."""
        horiz = jnp.mod(jnp.asarray(horizontal_angle, jnp.float32), 360.0)
        horiz = jnp.where(horiz < 0, horiz + 360.0, horiz)
        vert = jnp.asarray(vertical_angle, jnp.float32)

        e = self.embeds
        if self.positional_prompting == "off":
            return e["base"]

        if self.positional_prompting == "discrete":
            front = (horiz > 315.0) | (horiz <= 45.0)
            side = ((horiz > 45.0) & (horiz <= 135.0)) | ((horiz > 225.0) & (horiz <= 315.0))
            back = (horiz > 135.0) & (horiz <= 225.0)
            out = jnp.where(front, e["front"], jnp.where(side, e["side"], jnp.where(back, e["back"], e["side"])))
            return jnp.where(vert < 40.0, e["top"], out)

        # interpolated: blend around the horizontal circle, then toward top
        v = jnp.maximum(vert, 0.0)
        q1 = horiz * e["side"] + (90.0 - horiz) * e["front"]
        q2 = (horiz - 90.0) * e["back"] + (180.0 - horiz) * e["side"]
        q3 = (horiz - 180.0) * e["side"] + (270.0 - horiz) * e["back"]
        q4 = (horiz - 270.0) * e["front"] + (360.0 - horiz) * e["side"]
        blend = jnp.where(
            horiz <= 90.0, q1, jnp.where(horiz <= 180.0, q2, jnp.where(horiz <= 270.0, q3, q4))
        ) / 90.0
        return (v * blend + (90.0 - v) * e["top"]) / 90.0
