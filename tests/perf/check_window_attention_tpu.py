"""On-chip validation + A/B of the fused window-attention Pallas kernel.

Run manually on a TPU host (pytest CI pins the CPU backend, where the
kernel runs in interpret mode — tests/test_window_attention_kernel.py):

    python tests/perf/check_window_attention_tpu.py            # numerics
    python tests/perf/check_window_attention_tpu.py --bench    # + step A/B

Numerics: at every Swin-B stage shape (win_pack=2 geometry), the fused
kernel and the XLA einsum chain (both f32 and bf16 softmax) are compared
against a CPU f32 ground truth, forward and dq/dk/dv/dbias.

Bench: full Swin-B bs128 train step, attn_impl einsum-vs-fused, using
the same harness as bench.py's swin_b row.

Reference behavior: passl/models/swin_transformer.py WindowAttention
(qk + relative-position bias + shift mask + softmax + av).
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from passl_tpu.ops.pallas.window_attention import fused_window_attention

# Swin-B @224, win_pack=2 shapes per stage: (B_groups*imgs, h, L=2*49, d),
# n_mask = nwin/2 (shifted blocks) — bs8 slice is enough for numerics
STAGES = [
    ("stage1", 8 * 32, 4, 98, 32, 32),
    ("stage2", 8 * 8, 8, 98, 32, 8),
    ("stage3", 8 * 2, 16, 98, 32, 2),
    ("stage4", 8 * 1, 32, 49, 32, 1),
]


def chain(q, k, v, bias, mask, scale, acc):
    b, h, lq, d = q.shape
    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=acc)
    s = s + bias[None].astype(acc)
    n = mask.shape[0]
    s = s.reshape(b // n, n, h, lq, lq) + mask[None, :, None].astype(acc)
    s = s.reshape(b, h, lq, lq)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def pack_mask(n_mask, l):
    """Block-diag pack mask (+ random 'shift' pattern per group)."""
    rs = np.random.RandomState(7)
    m = np.full((n_mask, l, l), -100.0, np.float32)
    half = l // 2 if l > 49 else l
    m[:, :half, :half] = 0.0
    m[:, half:, half:] = 0.0
    if n_mask > 1:  # sprinkle shift-mask structure
        m[np.where(rs.rand(n_mask, l, l) > 0.9)] = -100.0
        np.einsum("nll->nl", m)[:] = 0.0  # diag always visible
    return m


def numerics():
    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    rs = np.random.RandomState(0)
    for name, b, h, l, d, n_mask in STAGES:
        q = np.asarray(rs.randn(b, h, l, d), np.float32)
        k = np.asarray(rs.randn(b, h, l, d), np.float32)
        v = np.asarray(rs.randn(b, h, l, d), np.float32)
        bias = np.asarray(rs.randn(h, l, l) * 0.1, np.float32)
        mask = pack_mask(n_mask, l)
        scale = d ** -0.5

        def loss_chain(q, k, v, bias, acc=jnp.float32):
            return jnp.sum(jnp.sin(chain(q, k, v, bias, jnp.asarray(mask),
                                         scale, acc)))

        def loss_fused(q, k, v, bias):
            return jnp.sum(jnp.sin(fused_window_attention(
                q, k, v, bias, jnp.asarray(mask), scale=scale)))

        def put(dev, *xs):
            return [jax.device_put(jnp.asarray(x), dev) for x in xs]

        gt_v, gt_g = jax.jit(jax.value_and_grad(loss_chain, argnums=(0, 1, 2, 3)),
                             device=cpu)(*put(cpu, q, k, v, bias))
        for tag, fn in (("chain_f32", jax.value_and_grad(loss_chain, argnums=(0, 1, 2, 3))),
                        ("chain_bf16", jax.value_and_grad(
                            lambda q, k, v, b: loss_chain(q, k, v, b, jnp.bfloat16),
                            argnums=(0, 1, 2, 3))),
                        ("fused", jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3)))):
            val, g = jax.jit(fn, device=tpu)(*put(tpu, q, k, v, bias))
            ev = abs(float(val) - float(gt_v)) / max(abs(float(gt_v)), 1.0)
            eg = max(float(jnp.max(jnp.abs(a - jax.device_put(b, tpu))))
                     for a, b in zip(g, gt_g))
            print(f"  {name} b{b}h{h}l{l} {tag:10s}: loss-relerr {ev:.2e} "
                  f"grad-maxabs-err {eg:.2e}")


def bench():
    import bench as benchmod  # repo-root bench.py harness

    for impl, sm in (("einsum", "bfloat16"), ("einsum", "float32"),
                     ("fused", "float32")):
        t = time.time()
        r = benchmod._bench_classifier(
            {"name": "swin_base_patch4_window7_224", "softmax_dtype": sm,
             "attn_impl": impl},
            128, 3006.0 / 8, grad_clip_norm=5.0)
        print(f"swin_b attn_impl={impl} softmax={sm}: {r} "
              f"({time.time() - t:.0f}s)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--skip-numerics", action="store_true")
    args = ap.parse_args()
    if not args.skip_numerics:
        numerics()
    if args.bench:
        bench()
