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


@pytest.mark.slow  # dp2·fsdp2·tp2 mesh compile (~13 s); sharding asserts
# stay in smoke via tests/test_parallel.py
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


def test_engine_mid_epoch_resume_skips_trained_batches(tmp_path):
    """A mid-epoch checkpoint resumes by fast-forwarding past the
    already-trained batches (the reference replays the partial epoch)."""
    cfg = _config(tmp_path)
    cfg["Global"]["max_train_step"] = 1  # stop after 1 of 2 steps
    e = Engine(cfg, mode="train")
    e.train()
    assert int(e.state.step) == 1

    cfg2 = _config(tmp_path)
    cfg2["Global"]["checkpoint"] = os.path.join(str(tmp_path), "latest.ckpt")
    e2 = Engine(cfg2, mode="train")
    e2.train()
    # finished the epoch exactly: 1 resumed + 1 new = 2 (not 3 = replay)
    assert int(e2.state.step) == e2.steps_per_epoch == 2


def test_engine_eval_ragged_tail_exact_count(tmp_path):
    """drop_last=False eval: the 24-sample set with batch 16 has an
    8-sample ragged tail; padding keeps shapes static and the metric
    averages over exactly 24 samples (device-side top-k path)."""
    cfg = _config(tmp_path)
    cfg["Global"]["eval_during_train"] = True
    cfg["Global"]["eval_interval"] = 1
    cfg["Metric"] = {"Eval": [{"TopkAcc": {"topk": [1]}}]}
    e = Engine(cfg, mode="train")
    assert e.eval_metrics_step is not None  # device path active
    metric = e.eval_loop.run()
    assert metric is not None and 0.0 <= metric <= 1.0
    # hand-check against the host path: run the same logits on host
    import jax.numpy as jnp

    n_total = len(e.eval_dataloader.dataset)
    seen, correct = 0, 0
    for batch in e.eval_dataloader:
        images, labels = batch
        take = min(len(labels), n_total - seen)
        if take <= 0:
            break
        bs = len(labels)
        if bs < 16:
            images = np.concatenate([images, np.repeat(images[-1:], 16 - bs, axis=0)])
        logits = np.asarray(e.eval_step(e.state, e.shard_batch(images)))[:take]
        correct += (logits.argmax(-1) == np.asarray(labels)[:take]).sum()
        seen += take
    assert seen == n_total == 24
    np.testing.assert_allclose(metric, correct / n_total, atol=1e-6)


def test_engine_interrupt_checkpoints_and_stops(tmp_path):
    """SIGTERM-style interruption (flag set mid-epoch) finishes the step,
    saves latest, and exits the loop; a relaunch resumes mid-epoch."""
    cfg = _config(tmp_path)
    e = Engine(cfg, mode="train")

    from passl_tpu.engine.hooks import Hook

    class StopAfterFirst(Hook):
        def iter_end(self, engine, step, metrics):
            engine.train_loop._interrupted = True

    e.hooks.hooks.append(StopAfterFirst())
    e.train()
    assert int(e.state.step) == 1
    assert os.path.exists(os.path.join(str(tmp_path), "latest.ckpt"))

    cfg2 = _config(tmp_path)
    cfg2["Global"]["checkpoint"] = os.path.join(str(tmp_path), "latest.ckpt")
    e2 = Engine(cfg2, mode="train")
    e2.train()
    assert int(e2.state.step) == 2
