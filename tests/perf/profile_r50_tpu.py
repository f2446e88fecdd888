"""ResNet-50 step-time attribution on TPU — the last "profiling pass
planned" note in docs/benchmarks.md (R50 conv core ~37 TFLOP/s
effective vs the rig's 149.5 TFLOP/s practical matmul peak: where does
the gap live?).

    python tests/perf/profile_r50_tpu.py            # full attribution
    python tests/perf/profile_r50_tpu.py --quick    # anchors only

Method (same as the CaiT attribution, docs/benchmarks.md Micro table):
1. anchor the real classifier step (bs256 bf16, CE + momentum);
2. time each stage of the backbone IN ISOLATION at its real input
   shape (fwd + bwd via a grads-forcing step), reading that stage's
   FLOPs from XLA's own compiled cost analysis -> effective TFLOP/s
   per stage;
3. a conv-width micro (1x1 convs at fixed spatial size, C swept) that
   separates "convs are slow" into lane-fill vs bandwidth mechanisms.

Prior probes already attributed BN (exact 101.5 ms / stats-constant
88.7 / no-stats 83.5 -> 12.7 ms backward-stats irreducible;
GhostGradBN ships the +13% opt-in), so this pass focuses on the conv
core. Reference baseline rows: BASELINE.md R50 CI rates.
"""
import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import bench as benchmod


def time_module(module, x_shape, iters=20):
    """fwd+bwd time + XLA-counted flops for a standalone flax module.

    The step computes grads wrt params (loss = mean(out^2), a dense
    gradient through every path) and folds them into the state with a
    0-coefficient update so nothing is DCE'd; fetch-synced like every
    bench number in this repo.
    """
    import jax
    import jax.numpy as jnp

    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2,) + x_shape[1:], jnp.bfloat16)
    variables = dict(jax.jit(module.init)(rng, x0))
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def step(state, x):
        def loss_fn(p):
            out = module.apply({"params": p, **state[1]}, x,
                               mutable=list(state[1].keys()) or False)
            out, new_rest = out if isinstance(out, tuple) else (out, state[1])
            return jnp.mean(jnp.square(out.astype(jnp.float32))), new_rest

        (loss, new_rest), grads = jax.value_and_grad(loss_fn, has_aux=True)(state[0])
        new_params = jax.tree_util.tree_map(lambda p, g: p - 0.0 * g.astype(p.dtype),
                                            state[0], grads)
        return (new_params, new_rest), {"loss": loss}

    rs = np.random.RandomState(0)
    xb = jnp.asarray(rs.rand(*x_shape).astype(np.float32), jnp.bfloat16)
    compiled = jax.jit(step).lower((params, rest), xb).compile()
    ca = compiled.cost_analysis()
    flops = (ca or {}).get("flops", 0.0)
    sec = benchmod._time_step(compiled, (params, rest), xb, iters=iters)
    return sec * 1e3, flops


def stage_modules():
    """The five R50 backbone stages as standalone modules, each at the
    exact (shape, dtype) it sees inside the real bs256 step."""
    import flax.linen as nn
    import jax.numpy as jnp

    from passl_tpu.models.resnet import BottleneckBlock
    from passl_tpu.nn import init as tinit

    dt = jnp.bfloat16

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                        dtype=dt,
                        kernel_init=tinit.kaiming_normal_(mode="fan_out",
                                                          nonlinearity="relu"),
                        name="conv1")(x)
            x = nn.BatchNorm(use_running_average=False, momentum=0.9,
                             dtype=dt, name="bn1")(x)
            x = nn.relu(x)
            return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    class Stage(nn.Module):
        filters: int
        n_blocks: int
        first_stride: int

        @nn.compact
        def __call__(self, x):
            for j in range(self.n_blocks):
                s = self.first_stride if j == 0 else 1
                in_ch = x.shape[-1]
                out_ch = self.filters * BottleneckBlock.expansion
                x = BottleneckBlock(filters=self.filters, strides=s,
                                    downsample=(s != 1 or in_ch != out_ch),
                                    dtype=dt, name=f"b{j}")(x, train=True)
            return x

    B = 256
    return [
        ("stem(7x7/2+pool)", Stem(), (B, 224, 224, 3)),
        ("layer1 3xC64@56", Stage(64, 3, 1), (B, 56, 56, 64)),
        ("layer2 4xC128@28", Stage(128, 4, 2), (B, 56, 56, 256)),
        ("layer3 6xC256@14", Stage(256, 6, 2), (B, 28, 28, 512)),
        ("layer4 3xC512@7", Stage(512, 3, 2), (B, 14, 14, 1024)),
    ]


def conv_width_micro():
    """1x1 conv effective TFLOP/s vs channel width at fixed flops.

    Each row does ~the same matmul flops (2*B*H*W*C*4C scaled by
    shrinking spatial size as C grows), isolating MXU lane/sublane
    fill from total-work effects. fwd-only: the question is pure conv
    throughput, not autodiff.
    """
    import jax
    import jax.numpy as jnp

    rows = []
    for c, hw in ((64, 112), (128, 56), (256, 28), (512, 14), (1024, 7)):
        # flops = 2*B*hw^2*c*(4c); with hw halving as c doubles this
        # stays constant at 2*256*112^2*64*256 ≈ 105 GFLOP
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.rand(256, hw, hw, c).astype(np.float32), jnp.bfloat16)
        k = jnp.asarray(rs.rand(1, 1, c, 4 * c).astype(np.float32), jnp.bfloat16)

        def f(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16)

        compiled = jax.jit(f).lower(x, k).compile()
        flops = (compiled.cost_analysis() or {}).get("flops", 0.0)
        y = compiled(x, k)
        float(jnp.sum(y.astype(jnp.float32)))  # warm + sync
        t0 = time.perf_counter()
        for _ in range(30):
            y = compiled(x, k)
        float(jnp.sum(y.astype(jnp.float32)))
        sec = (time.perf_counter() - t0) / 30
        rows.append((c, hw, flops, sec))
        print(f"1x1 conv C={c:4d}->{4*c:4d} @{hw:3d}x{hw:<3d}: "
              f"{sec*1e3:7.3f} ms  {flops/sec/1e12:6.1f} TFLOP/s eff",
              flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="anchors only")
    args = ap.parse_args()

    import jax

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from profile_cait_tpu import time_model  # same harness, real step

    from passl_tpu.models import build_model

    print("== real model anchors (bs256 bf16, CE + AdamW step) ==", flush=True)
    real = build_model({"name": "resnet50", "num_classes": 1000,
                        "dtype": "bfloat16"})
    ms, ips = time_model(real, per_chip_batch=256)
    print(f"real R50 classifier train step: {ms:.2f} ms  {ips:.1f} imgs/s/chip",
          flush=True)
    ms_f, _ = time_model(real, per_chip_batch=256, fwd_only=True)
    print(f"forward+loss only: {ms_f:.2f} ms ({ms_f / ms * 100:.0f}% of step)",
          flush=True)

    if args.quick:
        return

    print("\n== stage isolation (fwd+bwd, XLA-counted flops) ==", flush=True)
    total_ms = 0.0
    for name, mod, shape in stage_modules():
        t0 = time.time()
        ms_s, flops = time_module(mod, shape)
        total_ms += ms_s
        print(f"{name:18s} {ms_s:8.2f} ms  {flops/ (ms_s/1e3) / 1e12:6.1f} "
              f"TFLOP/s eff  ({flops/1e12:.2f} TF/step)  [{time.time()-t0:.0f}s]",
              flush=True)
    print(f"stage sum {total_ms:.2f} ms vs full step {ms:.2f} ms "
          f"(residual = head/pool/optimizer/loss + inter-stage fusion)",
          flush=True)

    print("\n== 1x1 conv width micro (constant ~105 GFLOP rows) ==", flush=True)
    conv_width_micro()


if __name__ == "__main__":
    main()
