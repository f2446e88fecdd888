"""Engine-level tests on the CPU mesh: full config-driven train with
hybrid parallelism, resume, and eval."""
import os

import numpy as np
import pytest

from passl_tpu.engine import Engine
from passl_tpu.utils.misc import create_attr_dict


def _config(tmp_path, **over):
    cfg = {
        "Global": {
            "epochs": 1, "output_dir": str(tmp_path), "print_batch_step": 1,
            "seed": 7, "eval_during_train": False, "save_interval": 1,
        },
        "Model": {
            "name": "VisionTransformer", "img_size": 16, "patch_size": 8,
            "embed_dim": 32, "depth": 1, "num_heads": 2, "num_classes": 4,
        },
        "Loss": {"Train": [{"CELoss": {}}]},
        "LRScheduler": {"name": "TimmCosine", "learning_rate": 1e-3},
        "Optimizer": {"name": "AdamW", "weight_decay": 0.05},
        "DataLoader": {
            "Train": {
                "dataset": {
                    "name": "SyntheticDataset", "size": 32, "image_size": 16,
                    "num_classes": 4,
                    "transform": [{"NormalizeImage": {"scale": 0.00392157}}],
                },
                "sampler": {"batch_size": 16, "shuffle": True, "drop_last": True},
                "loader": {"num_workers": 0, "prefetch": 0},
            },
            "Eval": {
                "dataset": {
                    "name": "SyntheticDataset", "size": 24, "image_size": 16,
                    "num_classes": 4,
                    "transform": [{"NormalizeImage": {"scale": 0.00392157}}],
                },
                "sampler": {"batch_size": 16, "shuffle": False, "drop_last": False},
                "loader": {"num_workers": 0, "prefetch": 0},
            },
        },
    }
    cfg.update(over)
    return create_attr_dict(cfg)


def test_engine_train_resume_eval(tmp_path):
    cfg = _config(tmp_path)
    e = Engine(cfg, mode="train")
    e.train()
    assert os.path.exists(os.path.join(str(tmp_path), "latest.ckpt"))
    step_after = int(e.state.step)
    assert step_after == e.steps_per_epoch

    # resume continues the counter
    cfg2 = _config(tmp_path)
    cfg2["Global"]["checkpoint"] = os.path.join(str(tmp_path), "latest.ckpt")
    cfg2["Global"]["epochs"] = 2
    e2 = Engine(cfg2, mode="train")
    e2.train()
    assert int(e2.state.step) == 2 * e2.steps_per_epoch

    # eval runs and returns a metric
    cfg3 = _config(tmp_path)
    e3 = Engine(cfg3, mode="eval")
    metric = e3.eval()
    assert metric is not None and np.isfinite(metric)


def test_engine_hybrid_parallel_sharded_state(tmp_path):
    cfg = _config(
        tmp_path,
        DistributedStrategy={"sharding_degree": 2, "mp_degree": 2,
                             "recompute": {"layerlist_interval": 1}},
    )
    cfg["Model"]["embed_dim"] = 64
    cfg["Model"]["num_heads"] = 4
    e = Engine(cfg, mode="train")
    assert dict(e.mesh.shape) == {"dp": 2, "fsdp": 2, "tp": 2}
    qkv = e.state.params["blocks_0"]["attn"]["qkv"]["kernel"]
    assert "tp" in str(qkv.sharding.spec)
    e.train()
    assert int(e.state.step) == e.steps_per_epoch
