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
