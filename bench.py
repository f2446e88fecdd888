"""Flagship benchmark: SimCLR ResNet-50 two-view pretrain step throughput.

Matches BASELINE.json's metric ("R50 SSL pretrain images/sec/chip").
Baseline: the reference's closest per-chip A100 number for a two-view
R50 SSL step — SimSiam pretrain 1969.93 imgs/s on 8xA100 (BASELINE.md
CI table) → 246.2 imgs/s/chip. vs_baseline = ours_per_chip / 246.2.

Runs on whatever chips are attached (bench rig: 1x TPU v5e). Synthetic
device-resident batches isolate the compute path (input pipeline is
benchmarked separately by tests/perf utilities).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_PER_CHIP = 1969.93 / 8  # A100 per-chip two-view R50 (SimSiam CI)


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from passl_tpu import distributed as dist
    from passl_tpu.core import TrainState
    from passl_tpu.engine.steps import make_train_step
    from passl_tpu.models import build_model
    from passl_tpu.optimizer import build_optimizer
    from passl_tpu.scheduler import build_lr_scheduler

    n_chips = len(jax.devices())
    mesh = dist.init_dist_env()
    per_chip_batch = 128
    batch = per_chip_batch * n_chips

    model = build_model({
        "name": "SimCLR",
        "backbone": {"name": "resnet50", "num_classes": 0, "with_pool": False},
        "neck": {"name": "NonLinearNeckfc3", "hid_channels": 2048, "out_channels": 128},
        "temperature": 0.5,
        "dtype": jnp.bfloat16,
    })
    rng = jax.random.PRNGKey(0)
    sample = (jnp.zeros((2, 224, 224, 3), jnp.bfloat16),) * 2
    # jit the init: un-jitted tracing executes op-by-op (slow on a
    # tunneled platform); jitted it is one XLA program.
    import functools

    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": rng, "dropout": rng, "shuffle": rng}, sample
    )
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}

    opt = build_optimizer({"name": "MomentumLARS", "momentum": 0.9, "weight_decay": 1e-4,
                           "one_dim_param_no_weight_decay": True}, params)
    lr_fn = build_lr_scheduler({"name": "CosineWarmup", "learning_rate": 0.3, "warmup_epochs": 1},
                               epochs=100, steps_per_epoch=1000)
    state = TrainState.create(params, model_state, opt.init(params), rng)
    state = jax.device_put(state, NamedSharding(mesh, P()))

    step = jax.jit(make_train_step(model, opt, lr_fn), donate_argnums=0)
    sh = NamedSharding(mesh, P(dist.DATA_AXES, None, None, None))
    rs = np.random.RandomState(0)
    v1 = jax.device_put(rs.rand(batch, 224, 224, 3).astype(np.float32) * 2 - 1, sh).astype(jnp.bfloat16)
    v2 = jax.device_put(rs.rand(batch, 224, 224, 3).astype(np.float32) * 2 - 1, sh).astype(jnp.bfloat16)

    # warmup/compile. NOTE: timing must synchronize via a literal value
    # fetch — on the tunneled test platform block_until_ready returns
    # before execution completes, so only float() is a true barrier.
    for _ in range(3):
        state, metrics = step(state, (v1, v2))
    float(metrics["loss"])

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, (v1, v2))
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * iters / dt
    per_chip = imgs_per_sec / n_chips
    print(json.dumps({
        "metric": "simclr_r50_pretrain_imgs_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "imgs/s/chip (224px two-view, bf16, global bs %d, %d chips)" % (batch, n_chips),
        "vs_baseline": round(per_chip / BASELINE_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
