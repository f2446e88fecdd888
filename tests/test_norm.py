"""BatchNorm variants (nn/norm.py): SubsampledBatchNorm semantics."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from passl_tpu.nn.norm import SubsampledBatchNorm


def _run(module, x, train=True):
    variables = module.init(jax.random.PRNGKey(0), x, use_running_average=not train)
    y, mut = module.apply(variables, x, use_running_average=not train,
                          mutable=["batch_stats"])
    return y, mut["batch_stats"], variables


def test_stride1_matches_flax_batchnorm():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(16, 4, 4, 8), jnp.float32)
    y1, stats1, _ = _run(SubsampledBatchNorm(stats_stride=1), x)
    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    variables = bn.init(jax.random.PRNGKey(0), x)
    y2, mut = bn.apply(variables, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats1["mean"]),
                               np.asarray(mut["batch_stats"]["mean"]), rtol=1e-5, atol=1e-6)


def test_stride4_uses_subsample_stats():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(32, 2, 2, 3), jnp.float32)
    y, stats, _ = _run(SubsampledBatchNorm(stats_stride=4), x)
    sub = np.asarray(x)[::4]
    mean = sub.mean(axis=(0, 1, 2))
    var = (sub ** 2).mean(axis=(0, 1, 2)) - mean ** 2
    expect = (np.asarray(x) - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-4, atol=1e-4)
    # running stats blend toward the subsample estimate (momentum 0.9)
    np.testing.assert_allclose(np.asarray(stats["mean"]), 0.1 * mean, rtol=1e-4, atol=1e-5)


def test_slice2_uses_prefix_stats():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(32, 2, 2, 3), jnp.float32)
    y, stats, _ = _run(SubsampledBatchNorm(stats_slice=2), x)
    sub = np.asarray(x)[:16]
    mean = sub.mean(axis=(0, 1, 2))
    var = (sub ** 2).mean(axis=(0, 1, 2)) - mean ** 2
    expect = (np.asarray(x) - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(stats["mean"]), 0.1 * mean, rtol=1e-4, atol=1e-5)


def test_slice_tiny_batch_falls_back_to_full_stats():
    x = jnp.asarray(np.random.RandomState(5).randn(2, 2, 2, 3), jnp.float32)
    y, _, _ = _run(SubsampledBatchNorm(stats_slice=8), x)
    # falls back to stride-1 full stats: per-feature normalization exact
    full = np.asarray(x)
    mean = full.mean(axis=(0, 1, 2))
    var = (full ** 2).mean(axis=(0, 1, 2)) - mean ** 2
    np.testing.assert_allclose(np.asarray(y), (full - mean) / np.sqrt(var + 1e-5),
                               rtol=1e-4, atol=1e-4)


def test_stride_and_slice_mutually_exclusive():
    import pytest

    x = jnp.zeros((16, 2, 2, 3), jnp.float32)
    with pytest.raises(ValueError, match="mutually exclusive"):
        _run(SubsampledBatchNorm(stats_stride=2, stats_slice=2), x)


def test_resnet_accepts_bn_stats_slice():
    from passl_tpu.models import build_model

    model = build_model({"name": "resnet18", "num_classes": 4, "cifar_stem": True,
                         "bn_stats_slice": 2})
    x = jnp.zeros((8, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    y, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert y.shape == (8, 4)


def test_eval_mode_uses_running_stats():
    x = jnp.ones((8, 2, 2, 3), jnp.float32) * 5.0
    m = SubsampledBatchNorm(stats_stride=2)
    variables = m.init(jax.random.PRNGKey(0), x, use_running_average=False)
    y = m.apply(variables, x, use_running_average=True)
    # fresh running stats: mean 0, var 1 -> y == x (up to eps)
    np.testing.assert_allclose(np.asarray(y), 5.0, rtol=1e-3)


def test_tiny_batch_falls_back_to_full_stats():
    # batch smaller than 2*stride: stride collapses to 1 (init safety)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 2, 2, 3), jnp.float32)
    y, _, _ = _run(SubsampledBatchNorm(stats_stride=8), x)
    assert np.isfinite(np.asarray(y)).all()


def test_large_mean_small_var_does_not_nan():
    # E[x^2]-mean^2 roundoff can go negative when |mean| >> std; the
    # clamp must keep outputs finite and running var non-negative
    rng = np.random.RandomState(3)
    x = jnp.asarray(10000.0 + 0.1 * rng.randn(32, 2, 2, 3), jnp.float32)
    y, stats, _ = _run(SubsampledBatchNorm(stats_stride=4), x)
    assert np.isfinite(np.asarray(y)).all()
    assert (np.asarray(stats["var"]) >= 0).all()


def test_bn_splits_and_stride_mutually_exclusive():
    from passl_tpu.models import build_model

    model = build_model({"name": "resnet18", "num_classes": 4, "cifar_stem": True,
                         "bn_splits": 4, "bn_stats_stride": 4})
    x = jnp.zeros((8, 16, 16, 3), jnp.float32)
    import pytest

    with pytest.raises(ValueError, match="mutually exclusive"):
        model.init(jax.random.PRNGKey(0), x, train=True)


def test_resnet_accepts_bn_stats_stride():
    from passl_tpu.models import build_model

    model = build_model({"name": "resnet18", "num_classes": 4, "cifar_stem": True,
                         "bn_stats_stride": 4})
    x = jnp.zeros((8, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    y, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert y.shape == (8, 4)


class TestFusedGradBatchNorm:
    """FusedGradBatchNorm == flax nn.BatchNorm in fwd, grads, and
    running-stat updates (the backward is hand-written, so grads are
    the contract under test)."""

    def _pair(self, x):
        from passl_tpu.nn.norm import FusedGradBatchNorm

        fl = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
        fg = FusedGradBatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
        vf = fl.init(jax.random.PRNGKey(0), x)
        vg = fg.init(jax.random.PRNGKey(0), x)
        return fl, fg, vf, vg

    def test_forward_and_running_stats_match_flax(self):
        x = jnp.asarray(np.random.RandomState(0).randn(16, 6, 6, 8) * 3 + 1,
                        jnp.float32)
        fl, fg, vf, vg = self._pair(x)
        yf, mf = fl.apply(vf, x, mutable=["batch_stats"])
        yg, mg = fg.apply(vg, x, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yg), atol=1e-5)
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(mf["batch_stats"][k]),
                np.asarray(mg["batch_stats"][k]), atol=1e-5)

    def test_grads_match_flax(self):
        x = jnp.asarray(np.random.RandomState(1).randn(16, 6, 6, 8),
                        jnp.float32)
        fl, fg, vf, vg = self._pair(x)

        def loss(mod, var, x):
            y, _ = mod.apply(var, x, mutable=["batch_stats"])
            return jnp.sum(jnp.sin(y))

        gf = jax.grad(lambda p, x: loss(fl, {"params": p, "batch_stats": vf["batch_stats"]}, x),
                      argnums=(0, 1))(vf["params"], x)
        gg = jax.grad(lambda p, x: loss(fg, {"params": p, "batch_stats": vg["batch_stats"]}, x),
                      argnums=(0, 1))(vg["params"], x)
        np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gg[1]),
                                   atol=2e-6, err_msg="dx")
        for k in ("scale", "bias"):
            np.testing.assert_allclose(np.asarray(gf[0][k]), np.asarray(gg[0][k]),
                                       atol=2e-5, err_msg=k)

    def test_eval_mode_uses_running_stats(self):
        from passl_tpu.nn.norm import FusedGradBatchNorm

        x = jnp.asarray(np.random.RandomState(2).randn(8, 4, 4, 8), jnp.float32)
        fl = nn.BatchNorm(use_running_average=True, epsilon=1e-5)
        fg = FusedGradBatchNorm(use_running_average=True, epsilon=1e-5)
        vf = fl.init(jax.random.PRNGKey(0), x)
        stats = {"mean": jnp.asarray(np.random.RandomState(3).rand(8), jnp.float32),
                 "var": jnp.asarray(np.random.RandomState(4).rand(8) + 0.5, jnp.float32)}
        vf = {"params": vf["params"], "batch_stats": stats}
        yf = fl.apply(vf, x)
        yg = fg.apply(vf, x)
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yg), atol=1e-5)

    def test_bf16_input_f32_stats(self):
        from passl_tpu.nn.norm import FusedGradBatchNorm

        x = jnp.asarray(np.random.RandomState(5).randn(32, 4, 4, 8), jnp.bfloat16)
        fg = FusedGradBatchNorm(use_running_average=False, dtype=jnp.bfloat16)
        v = fg.init(jax.random.PRNGKey(0), x)
        y, m = fg.apply(v, x, mutable=["batch_stats"])
        assert y.dtype == jnp.bfloat16
        assert m["batch_stats"]["mean"].dtype == jnp.float32
        assert np.isfinite(np.asarray(m["batch_stats"]["var"], np.float32)).all()


class TestGhostGradBatchNorm:
    def test_forward_matches_exact_bn(self):
        from passl_tpu.nn.norm import GhostGradBatchNorm

        x = jnp.asarray(np.random.RandomState(7).randn(16, 4, 4, 8) * 2 + 1,
                        jnp.float32)
        fl = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
        gg = GhostGradBatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
        vf = fl.init(jax.random.PRNGKey(0), x)
        yf, mf = fl.apply(vf, x, mutable=["batch_stats"])
        yg, mg = gg.apply(vf, x, mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(yf), np.asarray(yg), atol=1e-5)
        np.testing.assert_allclose(np.asarray(mf["batch_stats"]["var"]),
                                   np.asarray(mg["batch_stats"]["var"]), atol=1e-5)

    def test_backward_is_ghost(self):
        """dx must be inv*scale*dy exactly (no correction terms)."""
        from passl_tpu.nn.norm import GhostGradBatchNorm

        x = jnp.asarray(np.random.RandomState(8).randn(32, 8), jnp.float32)
        gg = GhostGradBatchNorm(use_running_average=False)
        v = gg.init(jax.random.PRNGKey(0), x)

        def f(x):
            y, _ = gg.apply(v, x, mutable=["batch_stats"])
            return jnp.sum(y * jnp.asarray(np.random.RandomState(9).randn(*y.shape),
                                           jnp.float32))

        dx = jax.grad(f)(x)
        mean = np.mean(np.asarray(x), axis=0)
        var = np.mean(np.asarray(x) ** 2, axis=0) - mean ** 2
        inv = 1.0 / np.sqrt(var + 1e-5)
        dy = np.random.RandomState(9).randn(32, 8).astype(np.float32)
        np.testing.assert_allclose(np.asarray(dx), dy * inv, rtol=1e-5, atol=1e-6)
