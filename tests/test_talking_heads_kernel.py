"""Fused talking-heads softmax kernel (ops/pallas/talking_heads.py).

CPU CI runs the kernel in Pallas interpret mode and checks fwd + VJP
equivalence against the 3-op XLA chain CaiT's einsum path uses
(reference `passl/models/cait.py` TalkingHead: mix -> softmax -> mix).
Covers non-divisible q tiling (padded rows must not leak into outputs
or weight grads) and bf16 score inputs.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from passl_tpu.models.cait import resolve_th_impl
from passl_tpu.ops.pallas.talking_heads import _pick_q_tile, talking_heads_softmax


def _chain(s, wl, ww):
    a = jnp.einsum("nhqk,hg->ngqk", s.astype(jnp.float32), wl)
    a = jax.nn.softmax(a, axis=-1)
    return jnp.einsum("nhqk,hg->ngqk", a, ww).astype(s.dtype)


def _rand(shape, seed, dtype=jnp.float32):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), dtype)


@pytest.mark.parametrize("q,k", [(16, 16), (49, 49)])  # 49: pads q to the tile
def test_fused_matches_chain_fwd_and_grads(q, k, monkeypatch):
    import passl_tpu.ops.pallas.talking_heads as T

    monkeypatch.setattr(T, "_pick_q_tile", lambda h, q, k: 16)
    n, h = 2, 4
    s = _rand((n, h, q, k), 0)
    wl = _rand((h, h), 1) * 0.2 + jnp.eye(h)
    ww = _rand((h, h), 2) * 0.2 + jnp.eye(h)
    cot = _rand((n, h, q, k), 3)

    fused = functools.partial(talking_heads_softmax, interpret=True)
    np.testing.assert_allclose(fused(s, wl, ww), _chain(s, wl, ww),
                               rtol=1e-5, atol=1e-5)

    def loss_fused(s, wl, ww):
        return jnp.sum(fused(s, wl, ww) * cot)

    def loss_chain(s, wl, ww):
        return jnp.sum(_chain(s, wl, ww) * cot)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(s, wl, ww)
    g_c = jax.grad(loss_chain, argnums=(0, 1, 2))(s, wl, ww)
    for a, b, name in zip(g_f, g_c, ("ds", "dproj_l", "dproj_w")):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4, err_msg=name)


def test_fused_bf16_scores():
    n, h, q, k = 2, 4, 16, 16
    s = _rand((n, h, q, k), 0, jnp.bfloat16)
    wl, ww = jnp.eye(h) * 0.9, jnp.eye(h) * 1.1
    out = talking_heads_softmax(s, wl, ww, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = _chain(s, wl, ww)
    np.testing.assert_allclose(out.astype(np.float32), ref.astype(np.float32),
                               rtol=2e-2, atol=2e-2)


def test_q_tile_budget():
    # cait_s24 224: whole q fits; cait_m36 384: must tile under ~3 MB f32
    assert _pick_q_tile(8, 196, 196) == 196
    qt = _pick_q_tile(16, 576, 576)
    assert qt < 576 and 16 * qt * 576 * 4 <= 3 * 1024 * 1024


def test_resolver_cpu_falls_back_to_einsum():
    assert resolve_th_impl("auto") == "einsum"  # CPU backend in tests
    assert resolve_th_impl("einsum") == "einsum"
    # explicit fused on a non-TPU backend downgrades loudly instead of
    # dying inside pallas_call with an opaque Mosaic error
    with pytest.warns(UserWarning, match="falling back"):
        assert resolve_th_impl("fused") == "einsum"
    with pytest.raises(ValueError):
        resolve_th_impl("nope")
