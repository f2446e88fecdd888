"""Discrete VAE (image tokenizer for BEiT/CAE targets).

Capability parity with reference `passl_v110/modeling/backbones/
discrete_vae.py` (617 LoC: conv encoder → vocab logits at /8
resolution, gumbel-softmax sampling, conv decoder, recon+KL training)
and `tasks/ssl/cae/dall_e/` (frozen DALL-E-style tokenizer used only
for `tokenize`). Weights are user-supplied for parity runs; the module
is also trainable standalone.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base import Model, register_model


class _ResBlock(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype, name="conv1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype, name="conv2")(y)
        if x.shape[-1] != self.dim:
            x = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + y


@register_model
class DiscreteVAE(Model):
    vocab_size: int = 8192
    hidden_dim: int = 256
    num_resblocks: int = 2
    downsamples: int = 3  # /8 token grid
    kl_weight: float = 0.0  # annealed externally when training the dVAE
    # Straight-through gumbel: decoder sees the HARD one-hot code (grad
    # flows through the soft sample). Without this, a fixed temperature
    # and kl_weight 0 let the decoder read the soft mixture of codebook
    # directions and the logits collapse onto a single code (observed:
    # 1/512 codes used after standalone training on the e2e synthetic
    # set, which made BEiT/CAE masked-token targets trivial). The
    # reference DALL-E recipe avoids this with temperature+KL annealing
    # (passl_v110 discrete_vae.py); straight-through is the
    # schedule-free equivalent at this scale.
    hard: bool = False
    gumbel_temperature: float = 1.0  # default for __call__'s temperature arg
    dtype: Any = jnp.float32

    def setup(self):
        enc = []
        dim = self.hidden_dim // 4
        for i in range(self.downsamples):
            enc.append(nn.Conv(dim, (4, 4), strides=(2, 2), padding=1, dtype=self.dtype,
                               name=f"enc_down{i}"))
            for j in range(self.num_resblocks):
                enc.append(_ResBlock(dim, self.dtype, name=f"enc_res{i}_{j}"))
            dim = min(dim * 2, self.hidden_dim)
        self.encoder_layers = enc
        self.to_logits = nn.Conv(self.vocab_size, (1, 1), dtype=self.dtype, name="to_logits")
        self.codebook = nn.Embed(self.vocab_size, self.hidden_dim, dtype=self.dtype, name="codebook")
        dec = []
        dim = self.hidden_dim
        for i in range(self.downsamples):
            for j in range(self.num_resblocks):
                dec.append(_ResBlock(dim, self.dtype, name=f"dec_res{i}_{j}"))
            dec.append(nn.ConvTranspose(max(dim // 2, 64), (4, 4), strides=(2, 2),
                                        padding="SAME", dtype=self.dtype, name=f"dec_up{i}"))
            dim = max(dim // 2, 64)
        self.decoder_layers = dec
        self.to_pixels = nn.Conv(3, (1, 1), dtype=self.dtype, name="to_pixels")

    def encode_logits(self, imgs):
        x = imgs
        for layer in self.encoder_layers:
            x = layer(x)
            if isinstance(layer, nn.Conv):
                x = nn.relu(x)
        return self.to_logits(x)  # [N, h, w, V]

    def tokenize(self, imgs) -> jnp.ndarray:
        """[N, h*w] int32 token ids (frozen-tokenizer path)."""
        logits = self.encode_logits(imgs)
        ids = jnp.argmax(logits, axis=-1)
        return ids.reshape(ids.shape[0], -1)

    def decode(self, ids, grid: int):
        z = self.codebook(ids).reshape(ids.shape[0], grid, grid, self.hidden_dim)
        x = z
        for layer in self.decoder_layers:
            x = layer(x)
            if isinstance(layer, nn.ConvTranspose):
                x = nn.relu(x)
        return self.to_pixels(x)

    def __call__(self, batch, train: bool = True, temperature: Optional[float] = None):
        """Standalone dVAE training: gumbel-softmax recon + KL-to-uniform."""
        if temperature is None:
            temperature = self.gumbel_temperature
        imgs = batch[0] if isinstance(batch, (tuple, list)) else batch
        logits = self.encode_logits(imgs)
        n, h, w, v = logits.shape
        if train:
            g = -jnp.log(-jnp.log(jax.random.uniform(self.make_rng("masking"), logits.shape) + 1e-9) + 1e-9)
            soft = jax.nn.softmax((logits + g) / temperature, axis=-1)
            if self.hard:
                hard1 = jax.nn.one_hot(jnp.argmax(soft, -1), v, dtype=soft.dtype)
                soft = soft + jax.lax.stop_gradient(hard1 - soft)
        else:
            soft = jax.nn.one_hot(jnp.argmax(logits, -1), v, dtype=logits.dtype)
        z = jnp.einsum("nhwv,vc->nhwc", soft, self.codebook.embedding.astype(logits.dtype))
        x = z
        for layer in self.decoder_layers:
            x = layer(x)
            if isinstance(layer, nn.ConvTranspose):
                x = nn.relu(x)
        recon = self.to_pixels(x)
        recon_loss = jnp.mean(jnp.square(recon.astype(jnp.float32) - imgs.astype(jnp.float32)))
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        kl = jnp.mean(jnp.sum(jnp.exp(logp) * (logp - (-jnp.log(v * 1.0))), axis=-1))
        return {"loss": recon_loss + self.kl_weight * kl, "recon_loss": recon_loss, "kl": kl}
