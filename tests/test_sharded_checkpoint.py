"""Orbax sharded checkpoint roundtrip on a sharded CPU-mesh state."""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from passl_tpu import distributed as dist
from passl_tpu.core import TrainState
from passl_tpu.distributed.sharding import VIT_TP_RULES, shard_train_state
from passl_tpu.models import build_model
from passl_tpu.optimizer import build_optimizer
from passl_tpu.utils import io


def test_sharded_roundtrip(tmp_path):
    mesh = dist.build_mesh(dp=2, fsdp=2, tp=2)
    model = build_model({"name": "VisionTransformer", "img_size": 16, "patch_size": 8,
                         "embed_dim": 64, "depth": 1, "num_heads": 4, "num_classes": 4})
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((4, 16, 16, 3))
    v = jax.jit(functools.partial(model.init, train=False))({"params": rng}, x)
    params = v["params"]
    opt = build_optimizer({"name": "AdamW"}, params)
    state = TrainState.create(params, {}, opt.init(params), rng)
    state = state.replace(step=jnp.asarray(9, jnp.int32))
    state, _ = shard_train_state(state, mesh, tp_rules=VIT_TP_RULES)

    path = io.save_sharded_checkpoint(state, str(tmp_path), prefix="latest")

    # restore onto a freshly-initialized sharded state
    v2 = jax.jit(functools.partial(model.init, train=False))({"params": jax.random.PRNGKey(1)}, x)
    fresh = TrainState.create(v2["params"], {}, opt.init(v2["params"]), rng)
    fresh, _ = shard_train_state(fresh, mesh, tp_rules=VIT_TP_RULES)
    restored = io.load_sharded_checkpoint(path, fresh)
    assert int(restored.step) == 9
    a = np.asarray(state.params["blocks_0"]["attn"]["qkv"]["kernel"])
    b = np.asarray(restored.params["blocks_0"]["attn"]["qkv"]["kernel"])
    assert np.allclose(a, b)
    # restored arrays keep the sharded layout
    assert "tp" in str(restored.params["blocks_0"]["attn"]["qkv"]["kernel"].sharding.spec)
    # generic load_checkpoint dispatches on directories
    restored2 = io.load_checkpoint(path, fresh)
    assert int(restored2.step) == 9


def test_auto_dispatch_trains_saves_restores_bit_identical(tmp_path):
    """VERDICT r1 item 6: train 2 sharded steps -> save (auto path must
    pick orbax for sharded state) -> restore -> bit-identical params and
    optimizer state; and a '<prefix>.ckpt' resume path finds the orbax dir."""
    import os

    from passl_tpu.engine.steps import make_train_step
    from passl_tpu.loss import build_loss
    from passl_tpu.scheduler import build_lr_scheduler

    mesh = dist.build_mesh(dp=2, fsdp=2, tp=2)
    model = build_model({"name": "VisionTransformer", "img_size": 16, "patch_size": 8,
                         "embed_dim": 64, "depth": 1, "num_heads": 4, "num_classes": 4})
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((8, 16, 16, 3))
    v = model.init({"params": rng, "dropout": rng}, x, train=True)
    params = v["params"]
    opt = build_optimizer({"name": "AdamW"}, params)
    state = TrainState.create(params, {}, opt.init(params), rng)
    state, _ = shard_train_state(state, mesh, tp_rules=VIT_TP_RULES)
    assert io.state_is_sharded(state)

    criterion = build_loss([{"CELoss": {}}])
    lr_fn = build_lr_scheduler({"name": "Constant", "learning_rate": 1e-3}, 1, 4)
    step = jax.jit(make_train_step(model, opt, lr_fn, criterion=criterion))
    from jax.sharding import NamedSharding, PartitionSpec as P

    xb = jax.device_put(np.random.RandomState(0).rand(8, 16, 16, 3).astype("float32"),
                        NamedSharding(mesh, P(dist.DATA_AXES, None, None, None)))
    yb = jax.device_put(np.arange(8, dtype="int32") % 4, NamedSharding(mesh, P(dist.DATA_AXES)))
    for _ in range(2):
        state, _m = step(state, (xb, yb))

    out = io.save_checkpoint_auto(state, str(tmp_path), prefix="latest")
    assert out.endswith("latest.orbax") and os.path.isdir(out)
    assert os.path.exists(tmp_path / "latest.states")

    fresh = TrainState.create(
        model.init({"params": jax.random.PRNGKey(7), "dropout": rng}, x, train=True)["params"],
        {}, opt.init(params), rng)
    fresh, _ = shard_train_state(fresh, mesh, tp_rules=VIT_TP_RULES)
    # resume via the config-facing '<prefix>.ckpt' name
    restored = io.load_checkpoint(str(tmp_path / "latest.ckpt"), fresh)
    assert int(restored.step) == 2
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
