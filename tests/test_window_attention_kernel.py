"""Fused window-attention Pallas kernel vs the einsum reference chain.

Interpret mode on CPU; the on-chip A/B lives in
tests/perf/check_window_attention_tpu.py + bench.py swin row.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from passl_tpu.ops.pallas.window_attention import fused_window_attention


def _ref(q, k, v, bias, mask, scale):
    b, h, lq, d = q.shape
    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                   preferred_element_type=jnp.float32)
    s = s + bias[None].astype(jnp.float32)
    if mask is not None:
        n = mask.shape[0]
        s = s.reshape(b // n, n, h, lq, -1) + mask[None, :, None].astype(jnp.float32)
        s = s.reshape(b, h, lq, -1)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))


def _mk(b=8, h=4, l=49, d=32, n_mask=None, seed=0, dtype=jnp.float32):
    rs = np.random.RandomState(seed)
    q = jnp.asarray(rs.randn(b, h, l, d), dtype)
    k = jnp.asarray(rs.randn(b, h, l, d), dtype)
    v = jnp.asarray(rs.randn(b, h, l, d), dtype)
    bias = jnp.asarray(rs.randn(h, l, l) * 0.1, jnp.float32)
    mask = None
    if n_mask:
        m = np.where(rs.rand(n_mask, l, l) > 0.7, -100.0, 0.0)
        mask = jnp.asarray(m, jnp.float32)
    return q, k, v, bias, mask


def test_forward_matches_einsum_no_mask():
    q, k, v, bias, _ = _mk()
    out = fused_window_attention(q, k, v, bias, None, interpret=True)
    ref = _ref(q, k, v, bias, None, 32 ** -0.5)
    assert out.shape == q.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_forward_matches_einsum_with_cycling_mask():
    """Per-window mask [n_mask, l, l] cycling over the window batch —
    the shifted-window case (b = images * n_mask, row-major)."""
    q, k, v, bias, mask = _mk(b=16, n_mask=8, seed=1)
    out = fused_window_attention(q, k, v, bias, mask, interpret=True)
    ref = _ref(q, k, v, bias, mask, 32 ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_forward_broadcast_mask_smaller_than_tile():
    """n_mask=1 (pack mask shared by every group) with w windows/program
    > n_mask exercises the broadcast branch."""
    q, k, v, bias, mask = _mk(b=8, h=2, n_mask=1, seed=2)
    out = fused_window_attention(q, k, v, bias, mask, interpret=True)
    ref = _ref(q, k, v, bias, mask, 32 ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_packed_pair_geometry():
    """The Swin win_pack=2 shape: L=98, block-diag -100 pack mask."""
    l = 98
    q, k, v, bias, _ = _mk(b=4, h=4, l=l, seed=3)
    pack = np.full((1, l, l), -100.0, np.float32)
    pack[:, :49, :49] = 0.0
    pack[:, 49:, 49:] = 0.0
    mask = jnp.asarray(pack)
    out = fused_window_attention(q, k, v, bias, mask, interpret=True)
    ref = _ref(q, k, v, bias, mask, 32 ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_grads_match_einsum():
    q, k, v, bias, mask = _mk(b=8, h=2, n_mask=4, seed=4)
    scale = 32 ** -0.5

    def loss_fused(q, k, v, bias):
        o = fused_window_attention(q, k, v, bias, mask, interpret=True)
        return jnp.sum(jnp.sin(o))

    def loss_ref(q, k, v, bias):
        return jnp.sum(jnp.sin(_ref(q, k, v, bias, mask, scale)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, name in zip(gf, gr, ("dq", "dk", "dv", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5, err_msg=name)


def test_bf16_inputs_f32_softmax():
    """bf16 q/k/v: kernel softmax runs f32 internally; compare against
    the f32 reference at bf16 tolerance."""
    q, k, v, bias, _ = _mk(seed=5, dtype=jnp.bfloat16)
    out = fused_window_attention(q, k, v, bias, None, interpret=True)
    ref = _ref(q.astype(jnp.float32), k.astype(jnp.float32),
               v.astype(jnp.float32), bias, None, 32 ** -0.5)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)


def test_swin_model_fused_impl_matches_einsum():
    """SwinTransformer forward with attn_impl=fused equals the einsum
    default to f32-softmax tolerance (same params)."""
    from passl_tpu.models import build_model

    kw = dict(img_size=56, patch_size=4, embed_dim=32, depths=(2, 2),
              num_heads=(2, 4), window_size=7, num_classes=8,
              drop_path_rate=0.0)
    m_ein = build_model({"name": "SwinTransformer", **kw})
    m_fused = build_model({"name": "SwinTransformer", "attn_impl": "fused",
                           "attn_interpret": True, **kw})
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 56, 56, 3), jnp.float32)
    var = m_ein.init({"params": rng}, x, train=False)
    y_ein = m_ein.apply(var, x, train=False)
    y_fused = m_fused.apply(var, x, train=False)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ein),
                               atol=1e-4, rtol=1e-4)


def test_swin_fused_on_cpu_without_interpret_falls_back():
    """Explicit attn_impl=fused on a non-TPU backend warns and falls
    back to einsum instead of dying inside Mosaic (same contract as
    CaiT th_impl)."""
    from passl_tpu.models.swin_transformer import resolve_window_impl

    with pytest.warns(UserWarning, match="falling back"):
        assert resolve_window_impl("fused", attn_drop=0.0,
                                   deterministic=True) == "einsum"
    assert resolve_window_impl("einsum") == "einsum"
