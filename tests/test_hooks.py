"""Hook API + pos-embed interpolation on pretrained load."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from passl_tpu.engine import Engine
from passl_tpu.engine.hooks import HOOKS, Hook, register_hook
from passl_tpu.utils.misc import create_attr_dict


@register_hook
class _CountingHook(Hook):
    calls = []

    def train_begin(self, engine):
        _CountingHook.calls.append("train_begin")

    def epoch_begin(self, engine, epoch):
        _CountingHook.calls.append(f"epoch_begin:{epoch}")

    def iter_end(self, engine, global_step, metrics):
        _CountingHook.calls.append(f"iter:{global_step}")

    def epoch_end(self, engine, epoch):
        _CountingHook.calls.append(f"epoch_end:{epoch}")

    def train_end(self, engine):
        _CountingHook.calls.append("train_end")


@pytest.mark.slow  # full engine train run (~15 s compile); hook-API unit
# coverage stays in smoke via the other tests in this file
def test_hooks_fire_at_boundaries(tmp_path):
    _CountingHook.calls.clear()
    cfg = create_attr_dict({
        "Global": {"epochs": 1, "output_dir": str(tmp_path), "print_batch_step": 100,
                   "save_interval": 0, "seed": 1,
                   "hooks": [{"name": "_CountingHook", "priority": 10}]},
        "Model": {"name": "resnet18", "num_classes": 4, "cifar_stem": True},
        "Loss": {"Train": [{"CELoss": {}}]},
        "LRScheduler": {"name": "Constant", "learning_rate": 0.01},
        "Optimizer": {"name": "Momentum"},
        "DataLoader": {"Train": {
            "dataset": {"name": "SyntheticDataset", "size": 16, "image_size": 16,
                        "num_classes": 4,
                        "transform": [{"NormalizeImage": {"scale": 0.00392157}}]},
            "sampler": {"batch_size": 8, "shuffle": False, "drop_last": True},
            "loader": {"num_workers": 0, "prefetch": 0},
        }},
    })
    e = Engine(cfg, mode="train")
    e.train()
    calls = _CountingHook.calls
    assert calls[0] == "train_begin"
    assert "epoch_begin:1" in calls and "epoch_end:1" in calls
    assert "iter:1" in calls and "iter:2" in calls
    assert calls[-1] == "train_end"


def test_pos_embed_interpolated_on_load(tmp_path):
    from passl_tpu.utils import io

    # "pretrained" ViT at 4x4 grid (+cls)
    pre = {"pos_embed": jnp.asarray(np.random.RandomState(0).rand(1, 17, 8), jnp.float32),
           "other": jnp.ones((3,))}
    io.save_params(pre, str(tmp_path / "p.params"))
    # new model at 8x8 grid (+cls)
    new = {"pos_embed": jnp.zeros((1, 65, 8)), "other": jnp.zeros((3,))}
    out = io.load_pretrained_into(str(tmp_path / "p.params"), new)
    assert out["pos_embed"].shape == (1, 65, 8)
    # cls slot passes through exactly
    assert np.allclose(np.asarray(out["pos_embed"][:, 0]), np.asarray(pre["pos_embed"][:, 0]))
    assert not np.allclose(np.asarray(out["pos_embed"]), 0)
