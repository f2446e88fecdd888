"""ToMe token merging tests."""
import jax
import jax.numpy as jnp
import numpy as np

from passl_tpu.models.utils.tome import ToMeBlock, bipartite_soft_matching, merge_tokens


def test_bipartite_matching_counts():
    rs = np.random.RandomState(0)
    metric = jnp.asarray(rs.rand(2, 16, 8), jnp.float32)
    dst, mask = bipartite_soft_matching(metric, r=3)
    assert dst.shape == (2, 8) and mask.shape == (2, 8)
    assert (np.asarray(mask).sum(axis=1) == 3).all()


def test_merge_preserves_total_mass():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.rand(2, 16, 8), jnp.float32)
    metric = jnp.asarray(rs.rand(2, 16, 4), jnp.float32)
    x2, size2 = merge_tokens(x, metric, r=4)
    assert x2.shape == (2, 16, 8)  # static shape kept (sentinel slots)
    # total token mass conserved: sum(size * x) invariant
    before = np.asarray(jnp.sum(x, axis=1))
    after = np.asarray(jnp.sum(x2 * size2[..., None], axis=1))
    assert np.allclose(before, after, atol=1e-4)
    assert np.allclose(np.asarray(size2).sum(axis=1), 16)


def test_tome_block_runs():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.rand(2, 16, 32), jnp.float32)
    block = ToMeBlock(num_heads=4, r=4)
    rng = jax.random.PRNGKey(0)
    variables = block.init({"params": rng}, x)
    out, size = block.apply(variables, x)
    assert out.shape == (2, 16, 32)
    assert np.isfinite(np.asarray(out)).all()
    assert float(jnp.sum(size)) == 32.0  # 2 * 16 token mass
