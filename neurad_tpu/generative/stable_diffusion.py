"""Score Distillation Sampling guidance (DreamFusion) with a Stable Diffusion
backbone.

Reference: `nerfstudio/generative/stable_diffusion.py` (the `gen` optional
extra). The split here is TPU-idiomatic:

- The SDS *math* — noise schedule, latent noising, classifier-free guidance,
  and the score-distillation gradient trick — is pure jnp (`sds_loss`,
  `add_noise`, `scaled_linear_alphas_cumprod`) and fully tested without any
  pretrained weights.
- The diffusion *backbone* (UNet / VAE / text encoder) stays a host-side torch
  model loaded via HuggingFace `diffusers`, exactly like the reference
  (`stable_diffusion.py:52-60` gates on the import). The UNet's noise
  prediction carries no gradient in SDS (`stable_diffusion.py:148-155` runs it
  under no_grad), so calling out to the host from a JAX training loop costs
  one device->host->device round trip per guidance step and breaks no
  gradients: the SDS gradient w.r.t. the rendered image flows only through
  `latents`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMG_DIM = 512
CONST_SCALE = 0.18215  # SD latent scaling (stable_diffusion.py:34)
SD_IDENTIFIERS = {
    "1-5": "runwayml/stable-diffusion-v1-5",
    "2-0": "stabilityai/stable-diffusion-2-base",
    "2-1": "stabilityai/stable-diffusion-2-1-base",
}


def scaled_linear_alphas_cumprod(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
) -> jnp.ndarray:
    """Cumulative alpha products of the SD "scaled_linear" beta schedule
    (PNDMScheduler defaults, `stable_diffusion.py:67-73`): betas are linear in
    sqrt space."""
    betas = jnp.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps) ** 2
    return jnp.cumprod(1.0 - betas)


def add_noise(
    latents: jnp.ndarray, noise: jnp.ndarray, alphas_cumprod: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """Forward-diffuse latents to timestep t: sqrt(a_t) x0 + sqrt(1-a_t) eps."""
    a = alphas_cumprod[t]
    return jnp.sqrt(a) * latents + jnp.sqrt(1.0 - a) * noise


def classifier_free_guidance(
    noise_pred_text: jnp.ndarray, noise_pred_uncond: jnp.ndarray, guidance_scale: float
) -> jnp.ndarray:
    """The reference's (unusual but intentional) CFG form for SDS:
    text + scale * (text - uncond) (`stable_diffusion.py:159`)."""
    return noise_pred_text + guidance_scale * (noise_pred_text - noise_pred_uncond)


def sds_loss(
    latents: jnp.ndarray,
    noise: jnp.ndarray,
    noise_pred: jnp.ndarray,
    alphas_cumprod: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """Score Distillation Sampling loss (`stable_diffusion.py:128-170`).

    Implements the detached-target trick: loss = 0.5 * ||latents - sg(latents
    - w(t) (noise_pred - noise))||^2 / B, whose gradient w.r.t. latents is
    exactly w(t) * (noise_pred - noise) — the DreamFusion score gradient —
    without differentiating through the UNet."""
    w = 1.0 - alphas_cumprod[t]
    grad = w * (noise_pred - noise)
    grad = jnp.nan_to_num(grad)
    target = jax.lax.stop_gradient(latents - grad)
    return 0.5 * jnp.sum((latents - target) ** 2) / latents.shape[0]


@dataclasses.dataclass
class StableDiffusionGuidance:
    """Host-side Stable Diffusion wrapper for SDS guidance.

    Like the reference (`stable_diffusion.py:42-91`), constructing this
    requires the optional `diffusers` package and downloads pretrained
    weights; everything numerical above is importable and tested without it.
    """

    version: str = "1-5"
    num_train_timesteps: int = 1000
    t_range: Tuple[float, float] = (0.02, 0.98)
    device: str = "cpu"

    def __post_init__(self):
        try:
            import torch  # noqa: F401
            from diffusers import StableDiffusionPipeline
        except ImportError as e:  # same gating as the reference's `gen` extra
            raise ImportError(
                "Stable Diffusion guidance needs the optional `diffusers` package "
                "(reference: `pip install nerfstudio[gen]`). The SDS math in this "
                "module works without it; only the pretrained backbone is gated."
            ) from e
        import torch

        self.min_step = int(self.num_train_timesteps * self.t_range[0])
        self.max_step = int(self.num_train_timesteps * self.t_range[1])
        self.alphas_cumprod = scaled_linear_alphas_cumprod(self.num_train_timesteps)

        pipe = StableDiffusionPipeline.from_pretrained(
            SD_IDENTIFIERS[self.version], torch_dtype=torch.float32
        ).to(self.device)
        pipe.enable_attention_slicing()
        self._torch = torch
        self.unet = pipe.unet
        self.tokenizer = pipe.tokenizer
        self.text_encoder = pipe.text_encoder
        self.vae = pipe.vae

    # -- host-side backbone calls (no gradients cross these) ----------------

    def get_text_embeds(self, prompt: str, negative_prompt: str = "") -> np.ndarray:
        """[2, L, D] (uncond, cond) text embeddings (`stable_diffusion.py:93-126`)."""
        torch = self._torch
        embeds = []
        for p in (negative_prompt, prompt):
            tokens = self.tokenizer(
                p, padding="max_length", max_length=self.tokenizer.model_max_length,
                truncation=True, return_tensors="pt",
            )
            with torch.no_grad():
                embeds.append(self.text_encoder(tokens.input_ids.to(self.device))[0])
        return torch.cat(embeds).cpu().numpy()

    def predict_noise(self, latents_noisy: np.ndarray, t: int, text_embeddings: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(uncond, text) noise predictions from the UNet, no grad."""
        torch = self._torch
        lat = torch.as_tensor(np.asarray(latents_noisy), device=self.device)
        emb = torch.as_tensor(np.asarray(text_embeddings), device=self.device)
        with torch.no_grad():
            pred = self.unet(torch.cat([lat, lat]), t, encoder_hidden_states=emb).sample
        uncond, text = pred.chunk(2)
        return uncond.cpu().numpy(), text.cpu().numpy()

    def imgs_to_latent(self, imgs: np.ndarray) -> np.ndarray:
        """[B,3,H,W] in [0,1] -> latents [B,4,H/8,W/8] (`stable_diffusion.py:242-254`)."""
        torch = self._torch
        x = torch.as_tensor(np.asarray(imgs), device=self.device) * 2 - 1
        with torch.no_grad():
            posterior = self.vae.encode(x).latent_dist
        return (posterior.mean * CONST_SCALE).cpu().numpy()

    def latents_to_img(self, latents: np.ndarray) -> np.ndarray:
        """Latents -> [B,3,H,W] images in [0,1] (`stable_diffusion.py:225-240`)."""
        torch = self._torch
        lat = torch.as_tensor(np.asarray(latents), device=self.device) / CONST_SCALE
        with torch.no_grad():
            imgs = self.vae.decode(lat).sample
        return ((imgs / 2 + 0.5).clamp(0, 1)).cpu().numpy()

    def sds_loss_for_image(
        self,
        rng: jax.Array,
        image_latents: jnp.ndarray,
        text_embeddings: np.ndarray,
        guidance_scale: float = 100.0,
        t: Optional[int] = None,
    ) -> jnp.ndarray:
        """One SDS guidance step: sample t, noise the latents, query the UNet
        (host side, no grad), return the jnp loss whose gradient w.r.t.
        `image_latents` is the score-distillation gradient."""
        k_t, k_n = jax.random.split(rng)
        if t is None:
            t = int(jax.random.randint(k_t, (), self.min_step, self.max_step + 1))
        noise = jax.random.normal(k_n, image_latents.shape, image_latents.dtype)
        noisy = add_noise(jax.lax.stop_gradient(image_latents), noise, self.alphas_cumprod, t)
        uncond, text = self.predict_noise(np.asarray(noisy), t, text_embeddings)
        noise_pred = classifier_free_guidance(jnp.asarray(text), jnp.asarray(uncond), guidance_scale)
        return sds_loss(image_latents, noise, noise_pred, self.alphas_cumprod, jnp.asarray(t))
