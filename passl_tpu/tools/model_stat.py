"""Model statistics: params / FLOPs / activation memory / throughput.

Capability parity with reference `tools_v110/model_stat/`
(`get_flops.py:20` hook-based FLOPs counter, `get_throughput.py:35`) —
on JAX the compiler itself reports exact FLOPs via cost analysis; no
per-layer hooks needed.

Usage:
  python -m passl_tpu.tools.model_stat -c <config> [-o overrides] \
      [--batch-size 64] [--throughput]
"""
from __future__ import annotations

import functools
import time

import numpy as np

from passl_tpu.utils import cfg_util


def main():
    import argparse

    ap = argparse.ArgumentParser("model stat")
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-o", "--override", action="append", default=[])
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--image-size", type=int, default=None)
    ap.add_argument("--throughput", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from passl_tpu.models import build_model

    config = cfg_util.get_config(args.config, overrides=args.override)
    model_cfg = dict(config["Model"])
    img = args.image_size or model_cfg.get("img_size", 224)
    model = build_model(model_cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((args.batch_size, img, img, 3), jnp.float32)
    variables = jax.jit(functools.partial(model.init, train=False))({"params": rng}, x)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))

    fwd = jax.jit(functools.partial(model.apply, train=False))
    lowered = fwd.lower(variables, x)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    flops = cost.get("flops", float("nan")) if cost else float("nan")
    mem = compiled.memory_analysis()

    print(f"model: {model_cfg.get('name')}")
    print(f"params: {n_params / 1e6:.2f} M")
    print(f"forward flops: {flops / 1e9:.2f} GFLOPs (batch {args.batch_size}) "
          f"= {flops / args.batch_size / 1e9:.2f} GFLOPs/img")
    if mem is not None:
        print(f"peak memory: args {mem.argument_size_in_bytes / 1e6:.1f} MB, "
              f"temps {mem.temp_size_in_bytes / 1e6:.1f} MB, "
              f"output {mem.output_size_in_bytes / 1e6:.1f} MB")
    if args.throughput:
        out = fwd(variables, x)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])[0]
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            out = fwd(variables, x)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])[0]
        dt = time.perf_counter() - t0
        print(f"inference throughput: {args.batch_size * iters / dt:.1f} imgs/s "
              f"({dt / iters * 1000:.2f} ms/batch)")


if __name__ == "__main__":
    main()
