"""Pallas fused-augment kernel tests (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy (smoke tier skips)

from passl_tpu.ops import augment as jaug
from passl_tpu.ops.pallas.augment_kernel import fused_augment


@pytest.fixture()
def images():
    rs = np.random.RandomState(0)
    return jnp.asarray(rs.randint(0, 256, (4, 32, 32, 3), np.uint8))


def test_normalize_only_matches_reference(images):
    out = fused_augment(images, jnp.int32(3), blur_prob=0.0, solarize_prob=0.0,
                        taps=5, interpret=True)
    ref = jaug.normalize(jaug.to_float(images))
    assert np.allclose(np.asarray(out, np.float32), np.asarray(ref), atol=1e-2)


def test_blur_smooths(images):
    out = fused_augment(images, jnp.int32(3), blur_prob=1.0, solarize_prob=0.0,
                        taps=9, sigma_range=(3.0, 3.0), interpret=True)
    ref = fused_augment(images, jnp.int32(3), blur_prob=0.0, solarize_prob=0.0,
                        taps=9, interpret=True)
    assert float(jnp.std(out.astype(jnp.float32))) < float(jnp.std(ref.astype(jnp.float32)))


def test_solarize_applied(images):
    # prob=1: every sample solarized; bright pixels flip
    out = fused_augment(images, jnp.int32(3), blur_prob=0.0, solarize_prob=1.0,
                        taps=5, solarize_threshold=0.5,
                        mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0), interpret=True)
    x = np.asarray(jaug.to_float(images))
    expected = np.where(x >= 0.5, 1.0 - x, x)
    assert np.allclose(np.asarray(out, np.float32), expected, atol=1e-2)


@pytest.mark.skipif(jax.devices()[0].platform != "tpu",
                    reason="interpret mode does not model per-program PRNG divergence "
                           "(verified on hardware: samples diverge)")
def test_per_sample_randomness(images):
    # blur sigma differs per sample → outputs differ across samples even
    # for identical inputs
    same = jnp.tile(images[:1], (4, 1, 1, 1))
    out = fused_augment(same, jnp.int32(7), blur_prob=1.0, solarize_prob=0.0,
                        taps=9, sigma_range=(0.1, 3.0))
    o = np.asarray(out, np.float32)
    assert not np.allclose(o[0], o[1], atol=1e-3)
