"""On-chip numeric validation of the fused talking-heads Pallas kernel.

Run manually on a TPU host (pytest CI pins the CPU backend, where the
kernel only runs in interpret mode — see tests/test_talking_heads_kernel.py):

    python tests/perf/check_talking_heads_tpu.py

Three-way check at CaiT-s24's self-attention shape (h=8, q=k=196) plus a
padded-q shape: TPU fused kernel and TPU XLA einsum chain are both compared
against a CPU float32 ground truth, forward and grads. Passes if the fused
kernel's error is within 2x of the XLA chain's own error.

Measured (v5e, 2026-08-17): the fused kernel is *more accurate* than the
chain it replaces — f32 scores: fused 2.8e-7 vs chain 3.3e-3 (XLA lowers
the f32 h x h head-mix einsums to MXU bf16 passes; the kernel's unrolled
mixes are f32 VPU FMAs); bf16 scores: fused 2.4e-4 vs chain 2.0e-3.
Perf A/B lives in docs/benchmarks.md (893.2 vs 693.3 imgs/s on CaiT-s24).

Reference behavior: passl/models/cait.py TalkingHeadAttn (mix -> softmax
-> mix across heads).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from passl_tpu.ops.pallas.talking_heads import talking_heads_softmax


def chain(s, wl, ww):
    a = jnp.einsum("nhqk,hg->ngqk", s.astype(jnp.float32), wl)
    a = jax.nn.softmax(a, axis=-1)
    return jnp.einsum("nhqk,hg->ngqk", a, ww).astype(s.dtype)


def report(cpu, tpu, n, h, q, k, dtype):
    rs = np.random.RandomState(0)
    s = np.asarray(rs.randn(n, h, q, k), np.float32)
    wl = np.asarray(rs.randn(h, h) * 0.2 + np.eye(h), np.float32)
    ww = np.asarray(rs.randn(h, h) * 0.2 + np.eye(h), np.float32)
    cot = np.asarray(rs.randn(n, h, q, k), np.float32)

    def put(dev, x, dt=jnp.float32):
        return jax.device_put(jnp.asarray(x, dt), dev)

    gt = np.asarray(jax.jit(chain, device=cpu)(
        put(cpu, s, dtype), put(cpu, wl), put(cpu, ww)), np.float32)
    out_chain = np.asarray(jax.jit(chain, device=tpu)(
        put(tpu, s, dtype), put(tpu, wl), put(tpu, ww)), np.float32)
    out_fused = np.asarray(jax.jit(talking_heads_softmax, device=tpu)(
        put(tpu, s, dtype), put(tpu, wl), put(tpu, ww)), np.float32)
    ec = np.max(np.abs(out_chain - gt))
    ef = np.max(np.abs(out_fused - gt))
    print(f"{dtype.__name__} n{n}h{h}q{q}k{k}: chain-vs-cpu {ec:.2e}  fused-vs-cpu {ef:.2e}")

    def gradfn(fn, dev):
        def loss(s_, wl_, ww_):
            return jnp.sum(fn(s_, wl_, ww_).astype(jnp.float32) * jnp.asarray(cot))
        return jax.jit(jax.grad(loss, argnums=(0, 1, 2)), device=dev)

    gcpu = gradfn(chain, cpu)(put(cpu, s, dtype), put(cpu, wl), put(cpu, ww))
    gch = gradfn(chain, tpu)(put(tpu, s, dtype), put(tpu, wl), put(tpu, ww))
    gfu = gradfn(talking_heads_softmax, tpu)(put(tpu, s, dtype), put(tpu, wl), put(tpu, ww))
    worst = 0.0
    for i, name in enumerate(("ds", "dwl", "dww")):
        a, b, g0 = (np.asarray(x[i], np.float32) for x in (gch, gfu, gcpu))
        sc = max(1.0, np.abs(g0).max())
        echain, efused = np.max(np.abs(a - g0)) / sc, np.max(np.abs(b - g0)) / sc
        worst = max(worst, efused - 2 * max(echain, 1e-4))
        print(f"  grad {name}: chain {echain:.2e}  fused {efused:.2e}")
    return ef <= max(2 * ec, 1e-2 if dtype == jnp.bfloat16 else 5e-3) and worst <= 0


def main():
    cpu = jax.devices("cpu")[0]
    tpus = [d for d in jax.devices() if d.platform != "cpu"]
    if not tpus:
        raise SystemExit("no TPU device — this check needs a real chip")
    ok = all([report(cpu, tpus[0], 2, 8, 196, 196, jnp.float32),
              report(cpu, tpus[0], 2, 8, 196, 196, jnp.bfloat16),
              report(cpu, tpus[0], 2, 8, 49, 49, jnp.bfloat16)])
    print("TPU parity", "OK" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
