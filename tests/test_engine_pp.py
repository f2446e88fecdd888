"""Engine-integrated pipeline parallelism (YAML-driven GPipe).

Closes the round-4 gap "pp from YAML is a warning, not a feature":
`DistributedStrategy.pipeline_parallel.degree` now partitions the ViT
block stack over a pp mesh axis through the GENERIC train step (model
pipeline path + pipeline_state_shardings placement), not just the
dryrun microcheck. The reference only plumbs pp_degree
(passl/distributed/env.py:306-332) with no pipelined model in-tree.

Parity contract: a pipeline=True model stores blocks as ONE stacked
param subtree whose pp=1 execution is a plain lax.scan, so pp=N vs
pp=1 runs share init + data and must match in loss.
"""
import os

import jax
import numpy as np
import pytest

from passl_tpu.engine import Engine
from passl_tpu.utils.misc import create_attr_dict


def _pp_config(tmp_path, pp_degree, sub=""):
    cfg = {
        "Global": {
            "epochs": 1, "output_dir": os.path.join(str(tmp_path), sub),
            "print_batch_step": 100, "seed": 7, "eval_during_train": False,
            "save_interval": 0, "max_train_step": 4,
        },
        "DistributedStrategy": {"pipeline_parallel": {"degree": pp_degree}},
        "Model": {
            "name": "VisionTransformer", "img_size": 16, "patch_size": 8,
            "embed_dim": 32, "depth": 4, "num_heads": 2, "num_classes": 4,
            # pp=1 builds with the SAME stacked-param structure so the
            # loss comparison is apples-to-apples (engine only
            # auto-injects pipeline=True when pp_degree > 1)
            "pipeline": True, "num_microbatches": 4,
        },
        "Loss": {"Train": [{"CELoss": {}}]},
        "LRScheduler": {"name": "TimmCosine", "learning_rate": 1e-3},
        "Optimizer": {"name": "AdamW", "weight_decay": 0.05},
        "DataLoader": {
            "Train": {
                "dataset": {
                    "name": "SyntheticDataset", "size": 64, "image_size": 16,
                    "num_classes": 4,
                    "transform": [{"NormalizeImage": {"scale": 0.00392157}}],
                },
                "sampler": {"batch_size": 32, "shuffle": True, "drop_last": True},
                "loader": {"num_workers": 0, "prefetch": 0},
            },
        },
    }
    return create_attr_dict(cfg)


def _train_loss(cfg):
    e = Engine(cfg, mode="train")
    e.train()
    return float(e.train_loop.last_metrics["loss"]), e


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_engine_pp2_loss_matches_pp1(tmp_path):
    loss_pp1, _ = _train_loss(_pp_config(tmp_path, 1, "pp1"))
    loss_pp2, e2 = _train_loss(_pp_config(tmp_path, 2, "pp2"))
    assert dict(e2.mesh.shape)["pp"] == 2
    assert np.isclose(loss_pp2, loss_pp1, rtol=1e-4, atol=1e-5), \
        f"pp2 loss {loss_pp2} != pp1 loss {loss_pp1}"


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_engine_pp_places_blocks_on_pp_axis(tmp_path):
    _, e = _train_loss(_pp_config(tmp_path, 2, "place"))
    from jax.sharding import PartitionSpec as P

    leaf = jax.tree_util.tree_leaves(e.state.params["blocks"])[0]
    assert leaf.sharding.spec == P("pp"), leaf.sharding
    # non-block params stay replicated
    head = jax.tree_util.tree_leaves(e.state.params["head"])[0]
    assert head.sharding.spec == P(), head.sharding


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_pp_checkpoint_is_degree_invariant(tmp_path):
    """Blocks are stored [depth, ...] regardless of pp, so a pp=2
    checkpoint resumes at pp=1 (and vice versa) — re-slicing a model
    across a different pipeline depth is a pure placement change."""
    cfg = _pp_config(tmp_path, 2, "save")
    cfg["Global"]["save_interval"] = 1
    _, e_save = _train_loss(cfg)
    steps_saved = int(e_save.state.step)
    assert steps_saved > 0

    cfg_resume = _pp_config(tmp_path, 1, "save")  # same output dir
    cfg_resume["Global"]["checkpoint"] = os.path.join(
        str(tmp_path), "save", "latest.ckpt")
    cfg_resume["Global"]["epochs"] = 2
    loss_resumed, e = _train_loss(cfg_resume)
    assert int(e.state.step) > steps_saved  # continued, not restarted
    assert np.isfinite(loss_resumed)


def test_pipeline_rejects_stochastic_depth(tmp_path):
    cfg = _pp_config(tmp_path, 1, "reject")
    cfg["Model"]["drop_path_rate"] = 0.1
    with pytest.raises(ValueError, match="pipeline"):
        Engine(cfg, mode="train")


def test_pp_with_tp_is_rejected(tmp_path):
    cfg = _pp_config(tmp_path, 2, "pp_tp")
    cfg["DistributedStrategy"]["tensor_parallel"] = {"degree": 2}
    with pytest.raises(ValueError, match="pipeline_parallel"):
        Engine(cfg, mode="train")
