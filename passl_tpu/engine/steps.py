"""Jitted train/eval step builders.

This replaces the reference's host-side hot loop internals
(`engine/loops/classification_loop.py:35-99` forward_backward →
grad_sync → scaler.step → clear_grad → lr_step, and
`contrastive_learning_loop.py:26-88`): on TPU the *entire* sequence —
micro-batch accumulation, forward/backward, loss unscale + finite
check, global-norm clip, per-group optimizer update, LR schedule, EMA
updates of momentum encoders and the full-model EMA shadow — is ONE
compiled XLA program. Data-parallel grad sync is implicit: the batch is
sharded over the mesh's data axes, so XLA inserts the reductions.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.amp import GradScaler
from ..core.train_state import TrainState, tree_where

MUTABLE = ["batch_stats", "ssl"]
RNG_STREAMS = ("dropout", "shuffle", "masking", "aug", "mixup")


def _split_rngs(key, names=RNG_STREAMS):
    keys = jax.random.split(key, len(names))
    return {n: k for n, k in zip(names, keys)}


def _total_loss(out) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Model output → (scalar loss, loss dict). SSL methods return a
    dict (reference contract: `loss_dict = model(batch)`)."""
    if isinstance(out, dict):
        if "loss" in out:
            total = out["loss"]
        else:
            total = sum(v for k, v in out.items() if "loss" in k)
        return total, {k: v for k, v in out.items()}
    return out, {"loss": out}


def ema_momentum_schedule(cfg: Dict[str, Any], total_steps: int) -> Callable[[Any], Any]:
    """Momentum-of-target schedule. 'cosine' mirrors reference CosineEMA
    (`models/utils/averaged_model.py:165-186`): m grows from base m to 1
    following 1 - (1-m)·(cos(pi·t/T)+1)/2."""
    base_m = float(cfg.get("momentum", 0.996))
    if cfg.get("schedule", None) == "cosine":
        def fn(step):
            t = jnp.clip(step.astype(jnp.float32) / max(total_steps, 1), 0.0, 1.0)
            return 1.0 - (1.0 - base_m) * (jnp.cos(jnp.pi * t) + 1.0) / 2.0

        return fn
    return lambda step: jnp.asarray(base_m, jnp.float32)


def apply_ema_pairs(params, step, ema_pairs):
    """ema_pairs: [(src_key, dst_key, m_fn)] — update params[dst] from
    params[src] with per-step momentum. Subtrees must be congruent."""
    if not ema_pairs:
        return params
    params = dict(params)
    for src, dst, m_fn in ema_pairs:
        m = m_fn(step)
        params[dst] = jax.tree_util.tree_map(
            lambda t, o: (m * t.astype(jnp.float32) + (1 - m) * o.astype(jnp.float32)).astype(t.dtype),
            params[dst],
            params[src],
        )
    return params


def make_train_step(
    model,
    optimizer,
    lr_fn: Callable,
    *,
    criterion: Optional[Callable] = None,
    grad_clip: Optional[Callable] = None,
    scaler: Optional[GradScaler] = None,
    accum_steps: int = 1,
    ema_pairs: Sequence[Tuple[str, str, Callable]] = (),
    full_ema_decay: Optional[float] = None,
    extra_metrics_fn: Optional[Callable] = None,
    param_transforms: Sequence[Tuple[str, Callable]] = (),
):
    """Build the pure train step.

    criterion=None  → SSL/contrastive: `model(batch)` returns loss dict.
    criterion given → classification: `model(images)` returns logits and
                      loss = criterion(logits, labels); batch is
                      (images, labels) or {'image', 'label'}.
    """

    def forward_loss(params, model_state, batch, rngs, scale):
        variables = {"params": params, **model_state}
        if criterion is None:
            out, new_ms = model.apply(variables, batch, train=True, mutable=MUTABLE, rngs=rngs)
            total, loss_dict = _total_loss(out)
        else:
            if isinstance(batch, dict):
                images, labels = batch["image"], batch["label"]
            else:
                images, labels = batch
            logits, new_ms = model.apply(variables, images, train=True, mutable=MUTABLE, rngs=rngs)
            # models with auxiliary objectives (e.g. the MoE router's
            # load-balance loss, models/vit_moe.py) return
            # {"logits", ...aux}: every "*loss*" entry joins the
            # objective; other entries become metrics
            aux = {}
            if isinstance(logits, dict):
                aux = {k: v for k, v in logits.items() if k != "logits"}
                logits = logits["logits"]
            total, loss_dict = _total_loss(criterion(logits, labels))
            for k, v in aux.items():
                if "loss" in k:
                    total = total + v
                loss_dict[k] = v
            if aux:
                # the logged/golden "loss" must equal the optimized
                # objective, aux terms included — otherwise a regression
                # that drops an aux loss passes golden CI unnoticed
                loss_dict["loss"] = total
            if extra_metrics_fn is not None:
                loss_dict.update(extra_metrics_fn(logits, labels))
        return total * scale, (new_ms, loss_dict)

    grad_fn = jax.value_and_grad(forward_loss, has_aux=True)

    def train_step(state: TrainState, batch):
        new_rng, step_key = jax.random.split(state.rng)
        scale = state.scaler_state.scale if (scaler is not None and state.scaler_state is not None) else jnp.float32(1.0)

        if accum_steps > 1:
            # micro-batch accumulation (reference Global.accum_steps):
            # batch leading dim reshaped to [accum, micro, ...]
            def micro(i, carry):
                grads_sum, ms, losses = carry
                sub = jax.tree_util.tree_map(
                    lambda x: x.reshape(accum_steps, -1, *x.shape[1:])[i], batch
                )
                rngs = _split_rngs(jax.random.fold_in(step_key, i))
                (_, (new_ms, ld)), grads = grad_fn(state.params, ms, sub, rngs, scale / accum_steps)
                grads_sum = jax.tree_util.tree_map(jnp.add, grads_sum, grads)
                losses = {k: losses.get(k, 0.0) + v / accum_steps for k, v in ld.items()} if losses else {
                    k: v / accum_steps for k, v in ld.items()
                }
                return grads_sum, new_ms, losses

            zeros = jax.tree_util.tree_map(lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            grads, new_model_state, loss_dict = micro(0, (zeros, state.model_state, None))
            for i in range(1, accum_steps):
                grads, new_model_state, loss_dict = micro(i, (grads, new_model_state, loss_dict))
        else:
            rngs = _split_rngs(step_key)
            (_, (new_model_state, loss_dict)), grads = grad_fn(
                state.params, state.model_state, batch, rngs, scale
            )

        # unscale + finite check (reference GradScaler._unscale)
        if scaler is not None and state.scaler_state is not None:
            grads, finite = scaler.unscale_and_check(grads, state.scaler_state)
            new_scaler_state = scaler.update(state.scaler_state, finite)
        else:
            finite = jnp.bool_(True)
            new_scaler_state = state.scaler_state

        grad_norm = jnp.float32(0.0)
        if grad_clip is not None:
            grads, grad_norm = grad_clip(grads)

        lr = lr_fn(state.step)
        new_params, new_opt_state = optimizer.apply(state.params, grads, state.opt_state, lr, state.step)

        # post-update param transforms (e.g. SwAV prototype L2-renorm,
        # reference swav.py prototypes weight normalization)
        if param_transforms:
            import re as _re

            from flax import traverse_util as _tu

            flat = _tu.flatten_dict(new_params, sep="/")
            for pat, fn in param_transforms:
                for path in list(flat):
                    if _re.search(pat, path):
                        flat[path] = fn(flat[path])
            new_params = _tu.unflatten_dict(flat, sep="/")

        # momentum-encoder EMA pairs (post-update, reference order:
        # update_parameters inside forward — schedule uses same step)
        new_params = apply_ema_pairs(new_params, state.step, ema_pairs)

        # skip everything if non-finite (fp16 parity)
        if scaler is not None:
            new_params = tree_where(finite, new_params, state.params)
            new_opt_state = tree_where(finite, new_opt_state, state.opt_state)
            new_model_state = tree_where(finite, dict(new_model_state), dict(state.model_state))

        new_ema = state.ema_params
        if full_ema_decay is not None and state.ema_params is not None:
            # callable decay supports threshold warmup (reference
            # models/utils/ema.py thres_steps: shadow mirrors the raw
            # params until warmup completes, then EMAs)
            d = full_ema_decay(state.step) if callable(full_ema_decay) else full_ema_decay
            new_ema = jax.tree_util.tree_map(lambda e, p: d * e + (1 - d) * p, state.ema_params, new_params)

        metrics = {"lr": lr, "grad_norm": grad_norm, **loss_dict}
        if scaler is not None:
            metrics["loss_scale"] = new_scaler_state.scale

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            model_state=dict(new_model_state),
            opt_state=new_opt_state,
            rng=new_rng,
            scaler_state=new_scaler_state,
            ema_params=new_ema,
        )
        return new_state, metrics

    return train_step


def make_eval_step(model, *, use_ema: bool = False):
    """Eval forward: returns logits (reference
    ClassificationEvaluationLoop's per-batch forward). Metric gathering
    across the mesh is implicit — outputs stay sharded; the host loop
    aggregates scalars."""

    def eval_step(state: TrainState, images):
        params = state.ema_params if (use_ema and state.ema_params is not None) else state.params
        variables = {"params": params, **state.model_state}
        return model.apply(variables, images, train=False)

    return eval_step


def make_eval_metrics_step(model, topk: Sequence[int] = (1, 5), *, use_ema: bool = False):
    """Fused eval forward + top-k on device: only per-batch scalar
    *sums* cross the host boundary (the reference all_gathers full
    logits+labels then computes TopkAcc on host,
    classification_loop.py:194-218 — on TPU that round-trips the logits;
    here top_k and the masked count reduce on device, and the data-
    parallel reduction is implicit under jit)."""
    topk = tuple(topk)
    maxk = max(topk)

    def step(state: TrainState, images, labels, valid):
        params = state.ema_params if (use_ema and state.ema_params is not None) else state.params
        variables = {"params": params, **state.model_state}
        logits = model.apply(variables, images, train=False)
        kk = min(maxk, logits.shape[-1])  # tiny CI configs may have < maxk classes
        _, pred = jax.lax.top_k(logits.astype(jnp.float32), kk)
        correct = (pred == labels[:, None]) & valid[:, None]
        out = {f"top{k}": jnp.sum(jnp.any(correct[:, :min(k, kk)], axis=-1).astype(jnp.float32))
               for k in topk}
        # the sums above are GLOBAL (over every shard of the batch);
        # ship the matching global denominator so multi-process loops
        # don't divide by a process-local count
        out["count"] = jnp.sum(valid.astype(jnp.float32))
        return out

    return step
