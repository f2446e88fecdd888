"""PASSL-TPU: a TPU-native self-supervised vision framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
PaddlePaddle/PASSL (reference layer map in /root/repo/SURVEY.md):
self-supervised pretraining (SimCLR, MoCo v1/v2/v3, BYOL, SimSiam, SwAV,
DenseCL, PixPro, MAE, ConvMAE, CAE, BEiT, DINO/DINOv2 probes, CLIP),
vision backbones (ResNet, ViT, DeiT, CaiT, Swin, ConvNeXt, ...), a
config-driven Engine/loop trainer, torch-style param-group optimizers,
and SPMD parallelism over a named `jax.sharding.Mesh` (dp/fsdp/tp axes)
instead of NCCL process groups.
"""

__version__ = "0.1.0"


def _apply_platform_override():
    """Honor PASSL_PLATFORM=cpu|tpu at package import time.

    Engine.__init__ also applies it, but that is too late if the caller
    (or a prior Engine) already initialized a JAX backend —
    jax.config.update('jax_platforms') after backend init is ineffective.
    Only touches jax when the env var is set, so the common import path
    stays jax-free (lazy exports below)."""
    import os

    plat = os.environ.get("PASSL_PLATFORM")
    if not plat:
        return
    import jax

    try:
        from jax._src import xla_bridge as _xb

        if _xb.backends_are_initialized():
            import warnings

            warnings.warn(
                f"PASSL_PLATFORM={plat} set but a JAX backend is already "
                f"initialized ({jax.default_backend()}); the override has "
                f"no effect", stacklevel=2)
            return
    except ImportError:
        pass
    jax.config.update("jax_platforms", plat)


_apply_platform_override()


def __getattr__(name):
    # lazy convenience exports (avoid importing jax at package import)
    if name == "Engine":
        from .engine import Engine

        return Engine
    if name == "build_model":
        from .models import build_model

        return build_model
    raise AttributeError(name)
