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
