"""Generative guidance (Score Distillation Sampling) — optional extra.

TPU-native counterpart of the reference's `nerfstudio/generative/` package
(`stable_diffusion.py`, `positional_text_embeddings.py`): the SDS math and
noise schedule are pure JAX (tested without any pretrained model); the
diffusion backbone itself is loaded through HuggingFace `diffusers` and is
gated the same way the reference gates its `gen` extra.
"""

from neurad_tpu.generative.positional_text_embeddings import PositionalTextEmbeddings
from neurad_tpu.generative.stable_diffusion import (
    StableDiffusionGuidance,
    scaled_linear_alphas_cumprod,
    sds_loss,
)

__all__ = [
    "PositionalTextEmbeddings",
    "StableDiffusionGuidance",
    "scaled_linear_alphas_cumprod",
    "sds_loss",
]
