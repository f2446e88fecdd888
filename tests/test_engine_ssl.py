"""Engine-level SSL config tests: SwAV multi-crop and CLIP dict batches
flow through build_dataloader → shard_batch → train step."""
import numpy as np
import pytest

from passl_tpu.engine import Engine
from passl_tpu.utils.misc import create_attr_dict


@pytest.mark.slow  # two crop-resolution compiles + sinkhorn (~30 s)
def test_engine_swav_multicrop(tmp_path):
    cfg = create_attr_dict({
        "Global": {"epochs": 1, "output_dir": str(tmp_path), "print_batch_step": 1,
                   "save_interval": 0, "seed": 3},
        "Model": {
            "name": "SwAV",
            "backbone": {"name": "resnet18", "num_classes": 0, "with_pool": False,
                         "cifar_stem": True},
            "neck": {"name": "SwAVNeck", "hid_channels": 64, "out_channels": 16},
            "dim": 16, "num_prototypes": 8, "num_crops": [2, 2],
            "crops_for_assign": [0, 1], "freeze_prototypes_iter": 1,
        },
        "LRScheduler": {"name": "TimmCosine", "learning_rate": 0.01},
        "Optimizer": {"name": "MomentumLARS", "momentum": 0.9},
        "DataLoader": {"Train": {
            "dataset": {
                "name": "SwAVMultiCropDataset",
                "dataset": {"name": "SyntheticDataset", "size": 16, "image_size": 32,
                            "num_classes": 4, "transform": None},
                "num_crops": [2, 2],
                "transforms": [
                    [{"RandomResizedCrop": {"size": 32, "scale": [0.3, 1.0]}},
                     {"NormalizeImage": {"scale": 0.00392157}}],
                    [{"RandomResizedCrop": {"size": 16, "scale": [0.1, 0.4]}},
                     {"NormalizeImage": {"scale": 0.00392157}}],
                ],
            },
            "sampler": {"batch_size": 8, "shuffle": True, "drop_last": True},
            "loader": {"num_workers": 0, "prefetch": 0},
        }},
    })
    e = Engine(cfg, mode="train")
    e.train()
    m = e.train_loop.last_metrics
    assert np.isfinite(float(m["loss"]))


def test_engine_clip_dict_batches(tmp_path):
    cfg = create_attr_dict({
        "Global": {"epochs": 1, "output_dir": str(tmp_path), "print_batch_step": 1,
                   "save_interval": 0, "seed": 4},
        "Model": {
            "name": "CLIP", "embed_dim": 16, "image_resolution": 32,
            "vision_layers": 1, "vision_width": 32, "vision_patch_size": 8,
            "context_length": 8, "vocab_size": 64,
            "transformer_width": 16, "transformer_heads": 2, "transformer_layers": 1,
        },
        "LRScheduler": {"name": "Constant", "learning_rate": 1e-4},
        "Optimizer": {"name": "AdamW", "weight_decay": 0.1},
        "DataLoader": {"Train": {
            "dataset": {"name": "SyntheticTextImageDataset", "size": 16,
                        "image_size": 32, "context_length": 8, "vocab_size": 64,
                        "transform": [{"NormalizeImage": {"scale": 0.00392157}}]},
            "sampler": {"batch_size": 8, "shuffle": True, "drop_last": True},
            "loader": {"num_workers": 0, "prefetch": 0},
        }},
    })
    e = Engine(cfg, mode="train")
    e.train()
    m = e.train_loop.last_metrics
    assert np.isfinite(float(m["loss"]))
    assert float(m["logit_scale"]) > 0
