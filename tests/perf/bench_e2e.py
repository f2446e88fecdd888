"""End-to-end throughput: real JPEG decode on host feeding the real
train step on the chip (VERDICT r1: the flagship bench was synthetic
device-resident only — this measures the whole pipeline).

SimCLR R18 (cifar-stem 32px would be trivial; use R50 @224, the
flagship) with the uint8 + on-device-aug recipe: host does cv2 decode +
RRC + flip, ships uint8; jitter/gray/blur/normalize run in-graph.

Prints loader-only, step-only, and overlapped end-to-end rates. On a
host with C cores the loader scales ~C×; this rig has ONE core, so the
e2e number is loader-bound by design (see docs/benchmarks.md feed math).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from bench_loader import RECIPES, make_jpeg_dataset  # noqa: E402


def main():
    import functools

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from passl_tpu import distributed as dist
    from passl_tpu.core import TrainState
    from passl_tpu.data import build_dataloader
    from passl_tpu.engine.steps import make_train_step
    from passl_tpu.models import build_model
    from passl_tpu.optimizer import build_optimizer
    from passl_tpu.scheduler import build_lr_scheduler

    batch = 128
    root = "/tmp/passl_jpeg"
    list_path = make_jpeg_dataset(root, 1500)
    mesh = dist.init_dist_env()

    model = build_model({
        "name": "SimCLR",
        "backbone": {"name": "resnet50", "num_classes": 0, "with_pool": False},
        "neck": {"name": "NonLinearNeckfc3", "hid_channels": 2048, "out_channels": 128},
        "temperature": 0.5, "use_device_augment": True,
        "dtype": jnp.bfloat16,
    })
    rng = jax.random.PRNGKey(0)
    sample = (jnp.zeros((2, 224, 224, 3), jnp.uint8),) * 2
    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": rng, "dropout": rng, "shuffle": rng, "aug": rng}, sample)
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}
    opt = build_optimizer({"name": "MomentumLARS", "momentum": 0.9}, params)
    lr_fn = build_lr_scheduler({"name": "Constant", "learning_rate": 0.1}, 1, 1)
    state = TrainState.create(params, model_state, opt.init(params), rng)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    step = jax.jit(make_train_step(model, opt, lr_fn), donate_argnums=0)
    sh = NamedSharding(mesh, P(dist.DATA_AXES, None, None, None))

    def put(views):
        return tuple(jax.device_put(np.ascontiguousarray(v), sh) for v in views)

    # step-only rate FIRST, on a quiet host (a live prefetch thread on
    # this 1-core rig contends with the dispatch loop and skews timing)
    rs = np.random.RandomState(0)
    resident = put((rs.randint(0, 256, (batch, 224, 224, 3), np.uint8),
                    rs.randint(0, 256, (batch, 224, 224, 3), np.uint8)))
    for _ in range(3):
        state, m = step(state, resident)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = step(state, resident)
    float(m["loss"])
    step_rate = batch * 10 / (time.perf_counter() - t0)

    dl = build_dataloader({
        "dataset": {"name": "ImageNetDataset", "image_root": root,
                    "cls_label_path": list_path, "transform": RECIPES["uint8-rrc"]},
        "sampler": {"batch_size": batch, "shuffle": True, "drop_last": True},
        "loader": {"num_workers": 0, "prefetch": 4},
    }, "Train", seed=0)

    # end-to-end: loader feeds fresh batches, step consumes
    it = iter(dl)
    (v1, v2), _ = next(it)  # warm the pipeline
    state, m = step(state, put((v1, v2)))
    n = 0
    t0 = time.perf_counter()
    for (v1, v2), _lab in it:
        state, m = step(state, put((v1, v2)))
        n += batch
        if n >= 8 * batch:
            break
    float(m["loss"])
    e2e_rate = n / (time.perf_counter() - t0)
    dl.close()

    ncpu = os.cpu_count()
    print(f"step-only : {step_rate:8.1f} imgs/s/chip (uint8 in, device aug in-graph)")
    print(f"end-to-end: {e2e_rate:8.1f} imgs/s ({ncpu}-core host; loader-bound when < step rate)")
    print(f"host cores needed to saturate one chip: ~{step_rate / max(e2e_rate, 1e-9):.0f} "
          f"(loader scales ~linearly with cores)")


if __name__ == "__main__":
    main()
