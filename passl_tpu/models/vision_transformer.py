"""Vision Transformer, TPU-native.

Capability parity with reference `passl/models/vision_transformer.py`
(`VisionTransformer` + Block/Attention/Mlp/PatchEmbed/DropPath, trunc-
normal init, class token + learned pos embed, pos-embed bicubic
interpolation on finetune `:365-427`) and the named variants used by the
configs (ViT-S/B/L/H, patch 16/32, 224/384, MoCo-v3 small variants).

TPU-first notes: NHWC input; attention einsums target the MXU with
fp32 accumulation; all shapes static so XLA tiles cleanly.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn import init as tinit
from ..nn.layers import Block, PatchEmbed
from .base import Model, register_model

Dtype = Any


def interpolate_pos_embed(pos_embed: jnp.ndarray, new_grid: int, num_prefix: int = 1) -> jnp.ndarray:
    """Bicubic-resize the grid part of a [1, P+prefix, C] pos embed
    (reference vision_transformer.py:365-427 / mae pos-embed interp)."""
    prefix = pos_embed[:, :num_prefix]
    grid = pos_embed[:, num_prefix:]
    old = int(math.sqrt(grid.shape[1]))
    c = grid.shape[-1]
    grid = grid.reshape(1, old, old, c)
    grid = jax.image.resize(grid, (1, new_grid, new_grid, c), method="bicubic")
    grid = grid.reshape(1, new_grid * new_grid, c)
    return jnp.concatenate([prefix, grid], axis=1)


@register_model
class VisionTransformer(Model):
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    init_values: Optional[float] = None
    num_classes: int = 1000
    global_pool: bool = False  # True: mean-pool tokens (MAE finetune style)
    norm_eps: float = 1e-6
    softmax_dtype: Dtype = "float32"  # attention-score precision; bf16 matches fp16-O2 recipes
    attn_impl: str = "einsum"  # "einsum" | "flash" (pallas, TPU) | "auto"
    dtype: Dtype = jnp.float32
    head_init: str = "trunc_normal"  # "trunc_normal" | "zeros" | "small"
    stop_grad_patch_embed: bool = False  # MoCo v3 trick (mocov3.py)
    remat: bool = False  # activation recompute (reference recompute_warp)
    # what the checkpointed blocks SAVE (memory/time trade):
    #   "nothing"       save block inputs only (max memory savings)
    #   "dots_no_batch" save weight-matmul outputs, recompute only the
    #                   batched attention dots — the scores, the usual
    #                   OOM driver — costs ~1/8 of a full re-forward
    #   "dots"          save every dot incl. scores (≈ no-remat memory)
    remat_policy: str = "nothing"
    # ---- pipeline parallelism (Engine-integrated; SURVEY §2.3 PP).
    # pipeline=True stores the block stack as ONE stacked param pytree
    # (leaves [depth, ...]) and runs it through the GPipe schedule in
    # distributed/pipeline.py over the mesh's `pp` axis — YAML surface:
    # DistributedStrategy.pipeline_parallel.degree + Model.pipeline.
    # The reference only plumbs pp_degree (passl/distributed/env.py:306)
    # with no pipelined model in-tree; this finishes that gesture.
    # Under pp=1 (or no pp axis) the same stacked params run through a
    # plain lax.scan, so checkpoints are pp-degree-invariant and a pp=N
    # run is loss-comparable against pp=1 (tests/test_engine_pp.py).
    # Constraints: depth % pp == 0, batch % num_microbatches == 0, and
    # stochastic-depth/dropout must be 0 (no per-layer rng threading
    # through the tick loop).
    pipeline: bool = False
    num_microbatches: int = 4

    def head_tokens(self):
        return 1

    @nn.compact
    def __call__(self, x, train: bool = True, return_features: bool = False):
        n = x.shape[0]
        x = PatchEmbed(
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        if self.stop_grad_patch_embed:
            x = jax.lax.stop_gradient(x)
        num_patches = x.shape[1]
        cls_token = self.param("cls_token", tinit.trunc_normal_(std=0.02), (1, 1, self.embed_dim), jnp.float32)
        pos_embed = self.param(
            "pos_embed", tinit.trunc_normal_(std=0.02), (1, num_patches + 1, self.embed_dim), jnp.float32
        )
        cls = jnp.broadcast_to(cls_token.astype(x.dtype), (n, 1, self.embed_dim))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + pos_embed.astype(x.dtype)
        x = nn.Dropout(self.drop_rate)(x, deterministic=not train)

        import numpy as _np

        if self.pipeline:
            x = self._pipelined_blocks(x, train)
            return self._head(x, train, return_features)

        dpr = [float(r) for r in _np.linspace(0, self.drop_path_rate, self.depth)]
        # activation checkpointing: re-materialize block activations in
        # the backward pass (TPU equivalent of the reference's
        # recompute_warp over LayerLists, core/recompute.py:34-43)
        if self.remat:
            from ..ops.attention import resolve_remat_policy

            BlockCls = nn.remat(Block, static_argnums=(2,),
                                policy=resolve_remat_policy(self.remat_policy))
        else:
            BlockCls = Block
        for i in range(self.depth):
            x = BlockCls(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path=dpr[i],
                init_values=self.init_values,
                norm_eps=self.norm_eps,
                dtype=self.dtype,
                softmax_dtype=self.softmax_dtype,
                attn_impl=self.attn_impl,
                name=f"blocks_{i}",
            )(x, not train)  # positional: remat static_argnums=(2,)

        return self._head(x, train, return_features)

    def _head(self, x, train: bool, return_features: bool):
        if self.global_pool:
            feats = jnp.mean(x[:, 1:], axis=1)
            feats = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="fc_norm")(feats)
        else:
            x = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm")(x)
            feats = x[:, 0]
        if return_features or self.num_classes == 0:
            return feats
        head_init = {
            "trunc_normal": tinit.trunc_normal_(std=0.02),
            "zeros": nn.initializers.zeros,
            "small": tinit.normal_(0.0, 0.01),
        }[self.head_init]
        return nn.Dense(self.num_classes, dtype=self.dtype, kernel_init=head_init, name="head")(feats)

    def _pipelined_blocks(self, x, train: bool):
        """GPipe over the mesh `pp` axis (distributed/pipeline.py).

        Blocks live as ONE stacked param subtree `blocks` with leaves
        [depth, ...] (stage-major contiguous, so a P('pp') placement on
        dim 0 puts each stage's layers on its device). The schedule
        needs no rng: pipeline mode requires dropout/droppath == 0."""
        if self.drop_rate or self.attn_drop_rate or self.drop_path_rate:
            raise ValueError(
                "pipeline=True requires drop_rate/attn_drop_rate/"
                "drop_path_rate == 0 (no per-tick rng threading)")
        from ..distributed import DATA_AXES, get_mesh
        from ..distributed.pipeline import make_pipelined_blocks

        block = Block(
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            init_values=self.init_values, norm_eps=self.norm_eps,
            dtype=self.dtype, softmax_dtype=self.softmax_dtype,
            attn_impl=self.attn_impl)
        tokens, dim = x.shape[1], x.shape[2]

        def stack_init(rng):
            def one(r):
                return block.init({"params": r},
                                  jnp.zeros((1, tokens, dim), self.dtype),
                                  True)["params"]

            return jax.vmap(one)(jax.random.split(rng, self.depth))

        stacked = self.param("blocks", stack_init)

        def block_apply(layer_params, h):
            def f(p, y):
                return block.apply({"params": p}, y, True)

            if self.remat:
                from ..ops.attention import resolve_remat_policy

                f = jax.checkpoint(
                    f, policy=resolve_remat_policy(self.remat_policy))
            return f(layer_params, h)

        mesh = get_mesh()
        S = dict(mesh.shape).get("pp", 1)
        n = x.shape[0]
        M = self.num_microbatches
        dp_total = 1
        for a in DATA_AXES:
            dp_total *= dict(mesh.shape).get(a, 1)
        # The GPipe schedule engages only when the microbatching divides
        # cleanly (train batches by config contract); other traces — the
        # shapes-only batch-2 init, remainder eval batches — run the
        # SAME stacked params through a plain scan, which is also the
        # pp=1 execution (so pp=N vs pp=1 loss parity holds by
        # construction, tests/test_engine_pp.py).
        engage = S > 1 and n % M == 0 and (n // M) % dp_total == 0
        if not engage:
            def body(h, layer):
                return block_apply(layer, h), None

            x, _ = jax.lax.scan(body, x, stacked)
            return x
        if self.depth % S:
            raise ValueError(f"depth {self.depth} not divisible by pp={S}")
        fn = make_pipelined_blocks(block_apply, mesh, data_axes=DATA_AXES)
        stage_params = jax.tree_util.tree_map(
            lambda a: a.reshape(S, self.depth // S, *a.shape[1:]), stacked)
        xm = x.reshape(M, n // M, tokens, dim)
        return fn(stage_params, xm).reshape(n, tokens, dim)


def _vit(**kw):
    return VisionTransformer(**kw)


_VARIANTS = {
    "ViT_tiny_patch16_224": dict(patch_size=16, embed_dim=192, depth=12, num_heads=3),
    "ViT_small_patch16_224": dict(patch_size=16, embed_dim=384, depth=12, num_heads=6),
    "ViT_base_patch16_224": dict(patch_size=16, embed_dim=768, depth=12, num_heads=12),
    "ViT_base_patch16_384": dict(img_size=384, patch_size=16, embed_dim=768, depth=12, num_heads=12),
    "ViT_base_patch32_224": dict(patch_size=32, embed_dim=768, depth=12, num_heads=12),
    "ViT_base_patch32_384": dict(img_size=384, patch_size=32, embed_dim=768, depth=12, num_heads=12),
    "ViT_large_patch16_224": dict(patch_size=16, embed_dim=1024, depth=24, num_heads=16),
    "ViT_large_patch16_384": dict(img_size=384, patch_size=16, embed_dim=1024, depth=24, num_heads=16),
    "ViT_large_patch32_384": dict(img_size=384, patch_size=32, embed_dim=1024, depth=24, num_heads=16),
    "ViT_huge_patch14_224": dict(patch_size=14, embed_dim=1280, depth=32, num_heads=16),
    # ViT-g/14 (reference configs/vision_transformer/
    # vit-g-p14-pt_in1k-224_1n8c.yaml: embed 1664, depth 48, heads 16,
    # mlp_ratio 4.9231)
    "ViT_g_patch14_224": dict(patch_size=14, embed_dim=1664, depth=48, num_heads=16,
                              mlp_ratio=4.9231),
    # MoCo v3 nomenclature (tasks/ssl/mocov3): small has mlp_ratio 4, 12 heads
    "mocov3_vit_small": dict(patch_size=16, embed_dim=384, depth=12, num_heads=12),
    "mocov3_vit_base": dict(patch_size=16, embed_dim=768, depth=12, num_heads=12),
}

from .base import MODELS  # noqa: E402


def _make_variant(name, defaults):
    def factory(**kw):
        merged = dict(defaults)
        merged.update(kw)
        return VisionTransformer(**merged)

    factory.__name__ = name
    MODELS.register(factory, name=name)
    return factory


for _name, _defaults in _VARIANTS.items():
    globals()[_name] = _make_variant(_name, _defaults)


def _make_hybrid_variant(name, defaults):
    """Tensor-parallel ViT aliases (reference `vision_transformer_hybrid.py`
    ViT_hybrid_base_patch16_224): same module — TP is declarative here.
    Use with `DistributedStrategy.mp_degree > 1`; the engine applies the
    megatron VIT_TP_RULES to qkv/proj/mlp kernels, which is the SPMD
    equivalent of the reference's ring-sharded linears + batch split."""

    def factory(**kw):
        merged = dict(defaults)
        merged.update(kw)
        return VisionTransformer(**merged)

    factory.__name__ = name
    MODELS.register(factory, name=name)


for _hname, _hdefaults in {
    "ViT_hybrid_base_patch16_224": dict(patch_size=16, embed_dim=768, depth=12, num_heads=12),
    "ViT_hybrid_large_patch16_224": dict(patch_size=16, embed_dim=1024, depth=24, num_heads=16),
}.items():
    _make_hybrid_variant(_hname, _hdefaults)
