"""CaiT-s24 step-time attribution on TPU (round-5 VERDICT ask #4).

The bench row runs 25.2% MFU (890 imgs/s, 2.89x reference) with the
fused talking-heads kernel; this script attributes the remaining ~75%
of the step with component ablations, the same method as the Swin
"47%-in-einsums" analysis (docs/benchmarks.md).

    python tests/perf/profile_cait_tpu.py            # attribution
    python tests/perf/profile_cait_tpu.py --pad      # + lane-pad A/B

Ablation clone: a local CaiT variant where one component at a time is
removed (TH mixes, score/softmax/av chain, MLP, class-attn stage). Its
"full" mode must time within ~2% of the real model (sanity anchor). All
numbers fetch-synced over 20 iters after warmup (bench._time_step).
Reference baseline: 2473 imgs/s/8 A100 fp16o2 (cait/README.md:57).
"""
import argparse
import functools
import os
import sys
import time
from typing import Any

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import bench as benchmod

ABLATIONS = [
    # (name, what the clone removes)
    ("full", "nothing — must match the real model"),
    ("plain_attn", "talking-head mixes (plain softmax attention)"),
    ("no_scores", "qk/softmax/av chain (attn out = proj(v))"),
    ("no_mlp", "the MLP branch of every SA block"),
    ("no_ln_ls", "LayerNorms + LayerScale in SA blocks (raw residual)"),
]


def build_clone(ablate: str, lane_pad: int = 0):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from passl_tpu.models.cait import CaiTCABlock
    from passl_tpu.nn import init as tinit
    from passl_tpu.nn.layers import DropPath, Mlp, PatchEmbed
    from passl_tpu.ops.pallas.talking_heads import talking_heads_softmax

    class AblatedTH(nn.Module):
        num_heads: int
        ablate: str
        lane_pad: int
        dtype: Any

        @nn.compact
        def __call__(self, x, deterministic=True):
            n, l, c = x.shape
            h = self.num_heads
            d = c // h
            scale = d ** -0.5
            acc = jnp.bfloat16
            qkv = nn.Dense(3 * c, dtype=self.dtype,
                           kernel_init=tinit.trunc_normal_(std=0.02),
                           name="qkv")(x)
            qkv = qkv.reshape(n, l, 3, h, d)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            if self.ablate == "no_scores":
                out = v.reshape(n, l, c)
            else:
                lp = l
                if self.lane_pad and l % self.lane_pad:
                    lp = ((l + self.lane_pad - 1) // self.lane_pad) * self.lane_pad
                    pad = lp - l
                    q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
                    k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
                    v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
                s = jnp.einsum("nqhd,nkhd->nhqk", q * scale, k,
                               preferred_element_type=acc)
                if lp != l:
                    # kill padded keys AFTER scores (and before any head
                    # mix: mixed -100s could flip sign, so mask must win)
                    s = s - jnp.where(jnp.arange(lp) >= l, 100.0,
                                      0.0)[None, None, None, :].astype(acc)
                if self.ablate == "plain_attn":
                    p = jax.nn.softmax(s, axis=-1)
                else:
                    proj_l = self.param("proj_l", tinit.trunc_normal_(std=0.02),
                                        (h, h), jnp.float32)
                    proj_w = self.param("proj_w", tinit.trunc_normal_(std=0.02),
                                        (h, h), jnp.float32)
                    p = talking_heads_softmax(s, proj_l, proj_w)
                out = jnp.einsum("nhqk,nkhd->nqhd", p.astype(self.dtype),
                                 v)[:, :l].reshape(n, l, c)
            out = nn.Dense(c, dtype=self.dtype,
                           kernel_init=tinit.trunc_normal_(std=0.02),
                           name="proj")(out)
            return out

    class AblatedSABlock(nn.Module):
        num_heads: int
        ablate: str
        lane_pad: int
        drop_path: float
        dtype: Any

        @nn.compact
        def __call__(self, x, deterministic=True):
            c = x.shape[-1]
            if self.ablate == "no_ln_ls":
                y = AblatedTH(self.num_heads, self.ablate, self.lane_pad,
                              self.dtype, name="attn")(x, deterministic)
                x = x + y
                return x + Mlp(hidden_features=4 * c, dtype=self.dtype,
                               name="mlp")(x, deterministic)
            g1 = self.param("gamma_1", tinit.constant_(1e-5), (c,), jnp.float32)
            g2 = self.param("gamma_2", tinit.constant_(1e-5), (c,), jnp.float32)
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
            y = AblatedTH(self.num_heads, self.ablate, self.lane_pad,
                          self.dtype, name="attn")(y, deterministic)
            x = x + DropPath(self.drop_path, name="dp1")(y * g1,
                                                         deterministic=deterministic)
            if self.ablate == "no_mlp":
                return x
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
            y = Mlp(hidden_features=4 * c, dtype=self.dtype, name="mlp")(y, deterministic)
            return x + DropPath(self.drop_path, name="dp2")(y * g2,
                                                            deterministic=deterministic)

    class AblatedCaiT(nn.Module):
        ablate: str = "full"
        lane_pad: int = 0
        embed_dim: int = 384
        depth: int = 24
        num_heads: int = 8
        num_classes: int = 1000
        dtype: Any = jnp.bfloat16

        @nn.compact
        def __call__(self, x, train=True):
            n = x.shape[0]
            x = PatchEmbed(patch_size=16, embed_dim=self.embed_dim,
                           dtype=self.dtype, name="patch_embed")(x)
            pos = self.param("pos_embed", tinit.trunc_normal_(std=0.02),
                             (1, x.shape[1], self.embed_dim), jnp.float32)
            cls_token = self.param("cls_token", tinit.trunc_normal_(std=0.02),
                                   (1, 1, self.embed_dim), jnp.float32)
            x = x + pos.astype(x.dtype)
            for i in range(self.depth):
                x = AblatedSABlock(self.num_heads, self.ablate, self.lane_pad,
                                   0.0, self.dtype,
                                   name=f"blocks_{i}")(x, deterministic=not train)
            cls = jnp.broadcast_to(cls_token.astype(x.dtype),
                                   (n, 1, self.embed_dim))
            if self.ablate != "no_ca":
                for i in range(2):
                    cls = CaiTCABlock(self.num_heads, 4.0, 1e-5, self.dtype,
                                      name=f"blocks_token_only_{i}")(
                        cls, x, deterministic=not train)
            x = jnp.concatenate([cls, x], axis=1)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
            return nn.Dense(self.num_classes, dtype=self.dtype,
                            kernel_init=tinit.trunc_normal_(std=0.02),
                            name="head")(x[:, 0])

    return AblatedCaiT(ablate=ablate, lane_pad=lane_pad)


def time_model(model, per_chip_batch=128, fwd_only=False):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from passl_tpu import distributed as dist
    from passl_tpu.core import TrainState
    from passl_tpu.engine.steps import make_train_step
    from passl_tpu.loss import build_loss
    from passl_tpu.optimizer import build_optimizer

    n_chips = len(jax.devices())
    mesh = dist.init_dist_env()
    batch = per_chip_batch * n_chips
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, 224, 224, 3), jnp.bfloat16)
    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": rng, "dropout": rng}, x0)
    params = variables["params"]
    # non-param collections (batch_stats for conv nets; empty for ViTs)
    # must live in the state or the compiled step's pytree diverges on
    # the first call that returns updated stats
    model_state = {k: v for k, v in variables.items() if k != "params"}
    criterion = build_loss([{"CELoss": {"label_smoothing": 0.1}}])
    opt = build_optimizer({"name": "AdamW", "weight_decay": 0.05,
                           "one_dim_param_no_weight_decay": True}, params)
    state = TrainState.create(params, model_state, opt.init(params), rng)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    sh = NamedSharding(mesh, P(dist.DATA_AXES, None, None, None))
    rs = np.random.RandomState(0)
    xb = jax.device_put(rs.rand(batch, 224, 224, 3).astype(np.float32) * 2 - 1,
                        sh).astype(jnp.bfloat16)
    yb = jax.device_put(np.asarray(rs.randint(0, 1000, batch), np.int32),
                        NamedSharding(mesh, P(dist.DATA_AXES)))
    if fwd_only:
        def fwd(state, b):
            x, y = b
            out = model.apply({"params": state.params, **state.model_state},
                              x, train=True,
                              mutable=list(state.model_state.keys()) or False,
                              rngs={"dropout": jax.random.PRNGKey(1)})
            if isinstance(out, tuple):  # mutable apply -> (out, new_vars)
                out = out[0]
            loss = criterion(out, y)
            return state, {"loss": loss["loss"] if isinstance(loss, dict)
                           else loss}

        step = jax.jit(fwd).lower(state, (xb, yb)).compile()
    else:
        step = jax.jit(make_train_step(model, opt, lambda s: 1e-3,
                                       criterion=criterion),
                       donate_argnums=0).lower(state, (xb, yb)).compile()
    sec = benchmod._time_step(step, state, (xb, yb))
    return sec * 1e3, batch / sec / n_chips


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pad", action="store_true", help="lane-pad A/B (196->256)")
    ap.add_argument("--quick", action="store_true", help="skip ablations")
    args = ap.parse_args()

    from passl_tpu.models import build_model

    print("== real model anchors ==", flush=True)
    real = build_model({"name": "cait_s24_224", "softmax_dtype": "bfloat16",
                        "num_classes": 1000, "dtype": "bfloat16"})
    ms, ips = time_model(real)
    print(f"real fused bf16 train step: {ms:.2f} ms  {ips:.1f} imgs/s/chip",
          flush=True)
    ms_f, ips_f = time_model(real, fwd_only=True)
    print(f"real fused bf16 forward+loss only: {ms_f:.2f} ms "
          f"({ms_f / ms * 100:.0f}% of step)", flush=True)

    if not args.quick:
        print("\n== ablation clone (component removed -> ms saved) ==", flush=True)
        base_ms = None
        for name, what in ABLATIONS + [("no_ca", "class-attention stage")]:
            t = time.time()
            ms_a, ips_a = time_model(build_clone(name))
            line = f"{name:12s} {ms_a:8.2f} ms  {ips_a:7.1f} imgs/s"
            if name == "full":
                base_ms = ms_a
                line += f"  (anchor; real {ms:.2f})"
            else:
                line += f"  saves {base_ms - ms_a:6.2f} ms " \
                        f"({(base_ms - ms_a) / base_ms * 100:4.1f}% of step) — {what}"
            print(line + f"  [{time.time() - t:.0f}s]", flush=True)

    if args.pad:
        # Measured 2026-08-19: the FUSED kernel cannot be lane-padded —
        # at L=256 its scores block hits a compile-time VMEM stack OOM
        # (17.58M > 16.00M scoped limit; the [q,k] tile doubles its k
        # width 196->256 and no longer fits next to the f32 mix
        # accumulators). Padding the production path would need a
        # q-gridded re-block of talking_heads.py. So the A/B isolates
        # the underlying question — does 196->256 score-chain padding
        # pay at all on TPU? — on the XLA einsum chain (plain_attn
        # clone), which compiles at both lengths.
        print("\n== lane-pad A/B on the plain-attn clone (ABAB) ==", flush=True)
        for rep in range(2):
            for name, lp in (("pad0", 0), ("pad256", 128)):  # 196 -> 256
                ms_p, ips_p = time_model(build_clone("plain_attn", lane_pad=lp))
                print(f"[rep{rep}] plain_attn {name}: {ms_p:.2f} ms  "
                      f"{ips_p:.1f} imgs/s", flush=True)


if __name__ == "__main__":
    main()
