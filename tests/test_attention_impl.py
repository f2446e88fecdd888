"""Attention implementation dispatch (ops/attention.py).

The flash path is a Pallas TPU kernel, so CPU CI exercises (a) the
resolver's fallback logic and (b) einsum-path equivalence when a model
is configured with attn_impl=flash on a non-TPU backend. Kernel-vs-
einsum numerics are covered by the TPU prototype run in
docs/benchmarks.md and guarded by the resolver (flash never selected
off-TPU).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from passl_tpu.ops import attention as A


def test_resolver_cpu_falls_back_to_einsum():
    # tests run on the CPU backend (conftest) — flash must never resolve
    assert A.resolve_attn_impl("flash", 197) == "einsum"
    assert A.resolve_attn_impl("auto", 197) == "einsum"
    assert A.resolve_attn_impl("einsum", 197) == "einsum"


def test_resolver_rejects_unknown():
    with pytest.raises(ValueError):
        A.resolve_attn_impl("fancy", 197)


def test_resolver_attn_dropout_gate():
    # attention-dropout in train mode is unsupported by the kernel; an
    # explicit flash request must warn about the downgrade
    with pytest.warns(UserWarning, match="falling back to einsum"):
        assert A.resolve_attn_impl("flash", 197, attn_drop=0.1,
                                   deterministic=False) == "einsum"


def test_remat_policy_resolver():
    assert A.resolve_remat_policy("nothing") is None
    assert A.resolve_remat_policy("dots") is not None
    with pytest.raises(ValueError, match="dots_nobatch"):
        A.resolve_remat_policy("dots_nobatch")


def test_einsum_attention_matches_manual():
    rng = np.random.RandomState(0)
    n, l, h, d = 2, 5, 2, 4
    q = jnp.asarray(rng.randn(n, l, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(n, l, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(n, l, h, d), jnp.float32)
    scale = d ** -0.5
    out = A.multi_head_attention(q, k, v, scale)
    # manual per-head reference
    ref = np.zeros((n, l, h, d), np.float32)
    qn, kn, vn = map(np.asarray, (q, k, v))
    for b in range(n):
        for hh in range(h):
            s = (qn[b, :, hh] * scale) @ kn[b, :, hh].T
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            ref[b, :, hh] = p @ vn[b, :, hh]
    np.testing.assert_allclose(np.asarray(out), ref.reshape(n, l, h * d),
                               rtol=1e-5, atol=1e-5)


def test_model_with_flash_knob_runs_on_cpu():
    """attn_impl=flash in a config must still work off-TPU (fallback)."""
    from passl_tpu.models import build_model

    model = build_model({"name": "ViT_tiny_patch16_224", "img_size": 32,
                         "num_classes": 10, "attn_impl": "flash"})
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(out)))
