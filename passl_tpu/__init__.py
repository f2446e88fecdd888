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


def __getattr__(name):
    # lazy convenience exports (avoid importing jax at package import)
    if name == "Engine":
        from .engine import Engine

        return Engine
    if name == "build_model":
        from .models import build_model

        return build_model
    raise AttributeError(name)
