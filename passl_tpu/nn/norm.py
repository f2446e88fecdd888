"""Normalization utilities.

- `l2_normalize`: reference `passl/nn/norm.py:18`.
- `SplitBatchNorm`: the jit-friendly TPU replacement for MoCo's
  shuffle-BN (reference `passl_v110/modeling/architectures/moco.py:107-152`
  gathers the global batch over NCCL, permutes, and relies on *per-GPU*
  BN statistics). Under `jit` over a sharded batch, plain BatchNorm
  statistics are already **global** (XLA inserts the cross-device
  reductions), which would let the key encoder cheat; SplitBatchNorm
  recreates the per-GPU-stats effect by computing statistics over
  `num_splits` virtual sub-batches — combined with a global random
  permutation of the batch this is exactly shuffle-BN, with zero
  explicit collectives.
- SyncBN (reference `models/swav.py:331-348`) needs no special module:
  any BatchNorm under jit-with-sharding is synchronized.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1, epsilon: float = 1e-12) -> jnp.ndarray:
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jnp.reciprocal(jnp.sqrt(jnp.maximum(sq, epsilon)))


class SplitBatchNorm(nn.Module):
    """BatchNorm whose train-mode statistics are computed independently
    over `num_splits` equal slices of the batch (per-virtual-device BN).

    Running stats are accumulated over the full batch (matching how the
    reference's per-GPU BN running stats average out across replicas at
    eval). Eval mode uses running stats as usual.
    """

    num_splits: int = 8
    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param("use_running_average", self.use_running_average, use_running_average)
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32) if self.use_scale else None
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32) if self.use_bias else None

        if use_ra:
            mean = ra_mean.value
            var = ra_var.value
            y = (x - mean) / jnp.sqrt(var + self.epsilon)
        else:
            n = x.shape[0]
            # tolerate tiny init batches: largest divisor <= num_splits
            import math as _math

            splits = _math.gcd(n, self.num_splits)
            xs = x.reshape(splits, n // splits, *x.shape[1:])
            red = tuple(range(1, xs.ndim - 1))
            mean_s = jnp.mean(xs.astype(jnp.float32), axis=red, keepdims=True)
            var_s = jnp.var(xs.astype(jnp.float32), axis=red, keepdims=True)
            y = ((xs - mean_s) / jnp.sqrt(var_s + self.epsilon)).reshape(x.shape)
            if not self.is_initializing():
                full_mean = jnp.mean(mean_s, axis=0).reshape(features)
                # E[x^2] decomposition so the full-batch var is exact.
                full_var = (
                    jnp.mean(var_s + jnp.square(mean_s), axis=0).reshape(features)
                    - jnp.square(full_mean)
                )
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * full_mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * full_var
        if scale is not None:
            y = y * scale
        if bias is not None:
            y = y + bias
        return y.astype(self.dtype or x.dtype)


class SubsampledBatchNorm(nn.Module):
    """BatchNorm whose train-mode statistics come from a subsample of
    the batch (EXPERIMENTAL throughput knob): every `stats_stride`-th
    sample, or — `stats_slice` — the first n/stats_slice samples.

    Rationale: the stats reduction is the HBM-bound half of BN on TPU
    (~16% of an R50 train step, docs/benchmarks.md); reading 1/stride of
    the batch for stats cuts that read proportionally, and with shuffled
    batches the subsample is an unbiased (noisier) estimator. Since the
    loader shuffles, a contiguous prefix is exactly as unbiased as a
    stride — but its slice VJP is a dense `pad` XLA can fuse, where the
    strided slice's VJP is the scatter that sank the first attempt:

    Measured result (v5e, SimCLR R50 bs128): stride 4 runs **0.6x** the
    exact-BN step — the forward saving is swamped by the backward, where
    exact gradients through the subsampled stats scatter into the full
    activation shape (stride-slice transpose = scatter). stride 1 through
    this class matches flax BatchNorm speed bit for bit.
    Defaults (1, 1) == exact BatchNorm.
    """

    stats_stride: int = 1
    stats_slice: int = 1  # stats over x[: n // stats_slice] (prefix)
    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        if self.stats_stride > 1 and self.stats_slice > 1:
            raise ValueError("stats_stride and stats_slice are mutually exclusive")
        use_ra = nn.merge_param("use_running_average", self.use_running_average, use_running_average)
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            if self.stats_slice > 1 and x.shape[0] >= 2 * self.stats_slice:
                sub = x[: x.shape[0] // self.stats_slice]
            else:
                stride = max(1, self.stats_stride) if x.shape[0] >= 2 * self.stats_stride else 1
                sub = x[::stride]
            red = tuple(range(sub.ndim - 1))
            count = 1
            for a in red:
                count *= sub.shape[a]
            # f32-accumulated reductions over the (possibly bf16)
            # subsample — never materialize an f32 copy of the
            # activations (that copy alone would cost more HBM traffic
            # than the subsampling saves)
            mean = jnp.sum(sub, axis=red, dtype=jnp.float32) / count
            sq = jnp.einsum("...c,...c->c", sub, sub,
                            preferred_element_type=jnp.float32) / count
            # E[x^2]-mean^2 can go slightly negative from roundoff when
            # |mean| >> std (flax clips identically) — unclamped it NaNs
            # the output and poisons the running var
            var = jnp.maximum(sq - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        # fold normalize into one fused multiply-add at the compute dtype
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = x * inv.astype(x.dtype) + (bias - mean * inv).astype(x.dtype)
        return y.astype(self.dtype or x.dtype)


@jax.custom_vjp
def _bn_fg_core(x, scale, bias, mean, inv):
    """Exact train-mode BN normalization with a hand-written backward.

    Forward math == flax BatchNorm (fast-variance path). The backward
    applies the closed-form BN gradient

        dx = inv*scale * (dy - mean_N(dy) - xhat * mean_N(dy*xhat))

    which folds autodiff's separate d(mean)/d(var) reduction chains into
    TWO reductions over (dy, xhat) plus one elementwise pass — measured
    10% off an R50 bs256 train step vs flax autodiff BN on v5e (the BN
    backward was the largest non-conv cost, docs/benchmarks.md). The
    gradient is EXACT (same projection identity autodiff computes:
    max |Δdx| 2.4e-7 vs flax on f32 — pure reassociation error).

    mean/inv arrive stop-gradiented (their VJP is what the closed form
    already accounts for); running-average updates happen in the module.
    """
    xf = x.astype(jnp.float32)
    return ((xf - mean) * (inv * scale) + bias).astype(x.dtype)


def _bn_fg_fwd(x, scale, bias, mean, inv):
    return _bn_fg_core(x, scale, bias, mean, inv), (x, scale, mean, inv)


def _bn_fg_bwd(res, dy):
    import numpy as np

    x, scale, mean, inv = res
    red = tuple(range(x.ndim - 1))
    n = float(np.prod([x.shape[i] for i in red]))
    dyf = dy.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * inv
    r1 = jnp.sum(dyf, axis=red)          # == dbias
    r2 = jnp.sum(dyf * xhat, axis=red)   # == dscale
    dx = (inv * scale) * (dyf - r1 / n - xhat * (r2 / n))
    return dx.astype(x.dtype), r2, r1, None, None


_bn_fg_core.defvjp(_bn_fg_fwd, _bn_fg_bwd)


class FusedGradBatchNorm(nn.Module):
    """Drop-in exact BatchNorm with the closed-form fused backward
    (`_bn_fg_core`). Train-mode statistics, running-average updates,
    epsilon/momentum semantics all match flax `nn.BatchNorm`; only the
    autodiff graph of the backward differs (fewer reduction passes).
    """

    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None
    use_bias: bool = True
    use_scale: bool = True

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param("use_running_average",
                                self.use_running_average, use_running_average)
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, jnp.float32))
        scale = (self.param("scale", nn.initializers.ones, (features,), jnp.float32)
                 if self.use_scale else jnp.ones(features, jnp.float32))
        bias = (self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
                if self.use_bias else jnp.zeros(features, jnp.float32))
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
            inv = jax.lax.rsqrt(var + self.epsilon) * scale
            y = x * inv.astype(x.dtype) + (bias - mean * inv).astype(x.dtype)
            return y.astype(self.dtype or x.dtype)
        red = tuple(range(x.ndim - 1))
        count = 1
        for a in red:
            count *= x.shape[a]
        mean = jax.lax.stop_gradient(
            jnp.sum(x, axis=red, dtype=jnp.float32) / count)
        sq = jax.lax.stop_gradient(
            jnp.einsum("...c,...c->c", x, x,
                       preferred_element_type=jnp.float32) / count)
        var = jnp.maximum(sq - jnp.square(mean), 0.0)
        if not self.is_initializing():
            ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
            ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        inv = jax.lax.rsqrt(var + self.epsilon)
        y = _bn_fg_core(x, scale, bias, mean, inv)
        return y.astype(self.dtype or x.dtype)


class GhostGradBatchNorm(nn.Module):
    """BatchNorm whose BACKWARD treats the current batch's statistics
    as constants (`dx = inv*scale*dy`, no mean/var correction terms).

    Forward is bit-identical to exact BN (current-batch stats, same
    running-average updates); only the gradient drops the stats
    correction — the classic "ghost gradient" approximation. Measured
    on v5e: R50 classifier bs256 step 88.7 ms vs 101.5 exact (-12.7%),
    and the clean A/B showed that cost is IRREDUCIBLE for exact
    gradients (a hand-written closed-form custom VJP is parity with XLA
    autodiff — see docs/benchmarks.md). Gradient bias is the well-known
    BN-approximation: zero at Edy=0 equilibrium; validated by the
    SimCLR R18 learning check (probe parity with exact BN). Opt-in via
    `bn_impl: ghost_grad` — never a silent default, exact-loss goldens
    would see it.
    """

    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param("use_running_average",
                                self.use_running_average, use_running_average)
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            red = tuple(range(x.ndim - 1))
            count = 1
            for a in red:
                count *= x.shape[a]
            # stop_gradient makes autodiff produce the ghost backward
            mean = jax.lax.stop_gradient(
                jnp.sum(x, axis=red, dtype=jnp.float32) / count)
            sq = jax.lax.stop_gradient(
                jnp.einsum("...c,...c->c", x, x,
                           preferred_element_type=jnp.float32) / count)
            var = jnp.maximum(sq - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(self.dtype or x.dtype)
