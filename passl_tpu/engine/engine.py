"""Engine: config-driven trainer orchestration.

Capability parity with reference `passl/engine/engine.py:46-377`
(Engine(config, mode) building dist env, seed, logger, dataloaders,
loss/metrics, AMP, model, optimizer+LR, pretrained load, strategy,
EMA, loop; train/eval/export modes) — with the same YAML block surface
(Global / DistributedStrategy / FP16 / Model / Loss / LRScheduler /
Optimizer / DataLoader / Metric).

TPU-native differences by design:
 - `dist.init_parallel_env` → one `jax.sharding.Mesh(dp, fsdp, tp)`.
 - DP grad sync / param broadcast are implicit in SPMD (no
   `param_sync`/`grad_sync` calls — XLA inserts them).
 - AMP O1/O2 → bf16 compute policy; dynamic scaler only for fp16.
 - Tensor fusion → no-op (XLA owns layout).
 - Recompute → `jax.checkpoint` policy on model blocks (model opt-in
   via `remat` field).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import distributed as dist
from ..core import ClipGradByGlobalNorm, GradScaler, Policy, TrainState
from ..data import build_dataloader
from ..loss import build_loss
from ..metrics import build_metrics
from ..models import build_model
from ..optimizer import build_optimizer
from ..scheduler import build_lr_scheduler
from ..utils import io, logger
from ..utils.infohub import runtime_info_hub
from . import loops as loops_mod
from .steps import (ema_momentum_schedule, make_eval_metrics_step,
                    make_eval_step, make_train_step)


def _maybe_force_platform():
    """Honor PASSL_PLATFORM=cpu|tpu before the first backend touch.

    Needed because an installed sitecustomize may force-set
    `jax_platforms` (the env var alone is then ignored) — multi-process
    CPU tests launch workers with PASSL_PLATFORM=cpu to get the virtual
    device mesh regardless."""
    plat = os.environ.get("PASSL_PLATFORM")
    if not plat:
        return
    try:
        from jax._src import xla_bridge as _xb

        if _xb.backends_are_initialized():
            # package-import-time override (passl_tpu.__init__) is the
            # reliable path; by Engine.__init__ a prior Engine or caller
            # may already have initialized a backend
            if jax.default_backend() != plat:
                logger.warning(
                    f"PASSL_PLATFORM={plat} set but JAX backend already "
                    f"initialized ({jax.default_backend()}); override inert")
            return
    except ImportError:
        pass
    jax.config.update("jax_platforms", plat)


def _maybe_init_multihost():
    """Multi-host bring-up (replaces `paddle.distributed.launch` env
    plumbing, SURVEY §3.1): on TPU pods `jax.distributed.initialize()`
    auto-discovers peers from the TPU metadata; elsewhere it needs
    coordinator env vars. Opt-in via env so single-host runs (and tests)
    never touch the distributed service:
      PASSL_MULTIHOST=1                         (TPU pod auto-discovery)
      or JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID set.
    """
    # NOTE: must run before the first backend touch (jax.devices() etc.)
    # — do not query process_count() here, it would initialize the
    # single-host backend and make distributed.initialize() fail.
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS")
    if not coord and os.environ.get("PASSL_MULTIHOST") != "1":
        return
    import jax

    try:
        if coord:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
                process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
            )
        else:
            jax.distributed.initialize()  # TPU pod auto-discovery
    except RuntimeError as e:  # already initialized (external launcher)
        logger.warning(f"jax.distributed.initialize skipped: {e}")


def _host_cpu_fingerprint() -> str:
    """Short hash of the host CPU's feature flags. XLA:CPU AOT blobs
    embed the compile machine's ISA features and can SIGILL when loaded
    on a different host (observed after a container migration: the
    loader warns 'doesn't match the machine type for execution' then
    crashes in thunk Execute); keying the CPU cache dir on the flags
    makes migration self-invalidating."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "unknown"


def _enable_compile_cache():
    """Persistent XLA compilation cache: first-compile of a train step
    can take minutes on TPU; cached recompiles are seconds. CPU-platform
    runs get a host-fingerprinted dir (see _host_cpu_fingerprint)."""
    try:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
        if cache_dir is None:
            if jax.default_backend() == "cpu":
                cache_dir = f"/tmp/jax_comp_cache_cpu_{_host_cpu_fingerprint()}"
            else:
                cache_dir = "/tmp/jax_comp_cache"
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


class Engine:
    def __init__(self, config: Dict[str, Any], mode: str = "train"):
        _maybe_force_platform()
        _maybe_init_multihost()
        _enable_compile_cache()
        self.config = config
        self.mode = mode
        g = config.get("Global", {})

        # ---- distributed mesh (reference: init_dist_env, engine.py:74)
        ds = dict(config.get("DistributedStrategy", {}) or {})

        def _degree(*keys, default=1):
            for k in keys:
                v = ds.get(k)
                if isinstance(v, dict):
                    v = v.get("degree")
                if v:
                    return int(v)
            return default

        mp_degree = _degree("tensor_parallel", "mp_degree")
        fsdp_degree = _degree("sharding", "sharding_degree", "fsdp_degree")
        pp_degree = _degree("pipeline_parallel", "pp_degree", "pipeline")
        self.mesh = dist.init_dist_env(dp=-1, fsdp=fsdp_degree, tp=mp_degree,
                                       pp=pp_degree)
        if pp_degree > 1 and (fsdp_degree > 1 or mp_degree > 1):
            raise ValueError(
                "pipeline_parallel composes with dp only for now — set "
                "sharding/tensor_parallel degree to 1 when pp_degree > 1 "
                "(docs/parallelism.md)")
        self.pp_degree = pp_degree
        self.recompute_cfg = ds.get("recompute", None)

        # ---- bookkeeping / logging
        self.output_dir = g.get("output_dir", "./output")
        name = config.get("Model", {}).get("name", "model")
        os.makedirs(self.output_dir, exist_ok=True)
        logger.init_logger("passl_tpu", os.path.join(self.output_dir, f"{mode}.log"))
        self.writer = None  # jsonl scalars via logger.scaler
        self.print_batch_step = int(g.get("print_batch_step", 10))
        self.save_interval = int(g.get("save_interval", 1))
        self.max_num_checkpoint = int(g.get("max_num_latest_checkpoint", 3))
        self.eval_during_train = bool(g.get("eval_during_train", False))
        self.eval_interval = int(g.get("eval_interval", 1))
        self.eval_unit = g.get("eval_unit", "epoch")
        self.epochs = int(g.get("epochs", 1))
        self.accum_steps = int(g.get("accum_steps", 1))
        self.max_train_step = g.get("max_train_step", None)
        self.checkpoint_path = g.get("checkpoint", None)
        self.save_on_interrupt = bool(g.get("save_on_interrupt", True))
        self.pretrained_model = g.get("pretrained_model", None)
        self.profiler_options = g.get("profiler_options", None)
        self.seed = int(g.get("seed", 42))
        # seed the ambient python/numpy RNGs per rank (reference
        # engine.py:77-89 "seed = config seed + rank"). The data pipeline
        # does NOT rely on this — loader aug is keyed per sample
        # (loader._sample_key) so it is reproducible and topology/worker
        # invariant — but anything else touching the global RNGs gets a
        # deterministic stream too.
        import random as _random

        _rank = jax.process_index() if jax.process_count() > 1 else 0
        _random.seed(self.seed + _rank)
        np.random.seed((self.seed + _rank) % (2**31))

        # ---- data
        dl_cfg = config.get("DataLoader", {})
        self.train_dataloader = None
        self.eval_dataloader = None
        if mode == "train" and "Train" in dl_cfg:
            self.train_dataloader = build_dataloader(dl_cfg["Train"], "Train", seed=self.seed)
            self.global_batch_size = dl_cfg["Train"]["sampler"].get("batch_size", 128)
        if "Eval" in dl_cfg and (mode == "eval" or self.eval_during_train or mode == "train"):
            self.eval_dataloader = build_dataloader(dl_cfg["Eval"], "Eval", seed=self.seed)
            if mode != "train":
                self.global_batch_size = dl_cfg["Eval"]["sampler"].get("batch_size", 128)

        self.steps_per_epoch = len(self.train_dataloader) if self.train_dataloader else 0
        self.total_steps = self.steps_per_epoch * self.epochs
        runtime_info_hub.update(
            epochs=self.epochs, max_steps=self.total_steps, total_iterations=self.total_steps
        )

        # ---- loss & metrics
        self.criterion = build_loss(config.get("Loss", {}).get("Train")) if config.get("Loss") else None
        metric_cfg = config.get("Metric", {})
        self.metric_fns = build_metrics(metric_cfg.get("Eval") or metric_cfg.get("Train")) if metric_cfg else []
        if not self.metric_fns and self.eval_dataloader is not None:
            from ..metrics import TopkAcc

            self.metric_fns = [TopkAcc()]

        # ---- precision
        fp16_cfg = config.get("FP16", None)
        self.policy = Policy.from_config(fp16_cfg)
        self.scaler = None
        if self.policy.use_loss_scaling:
            sc = (fp16_cfg or {}).get("GradScaler", {})
            self.scaler = GradScaler(**{k: v for k, v in sc.items()
                                        if k in GradScaler.__dataclass_fields__})

        # ---- model
        model_cfg = dict(config.get("Model", {}))
        if "dtype" not in model_cfg and self.policy.compute_dtype != jnp.float32:
            model_cfg["dtype"] = self.policy.compute_dtype
        if self.recompute_cfg and "remat" not in model_cfg:
            # DistributedStrategy.recompute → jax.checkpoint on blocks
            model_cfg["remat"] = True
        if self.pp_degree > 1 and "pipeline" not in model_cfg:
            # pp_degree > 1 turns on the model's GPipe block path (stacked
            # block params scheduled over the pp axis). Models without a
            # `pipeline` field fall through to the warning below.
            model_cfg["pipeline"] = True
        try:
            self.model = build_model(model_cfg)
        except TypeError:
            retried = False
            if model_cfg.pop("remat", None) is not None:
                logger.warning(f"model {name} does not support remat; recompute ignored")
                retried = True
            if self.pp_degree > 1 and model_cfg.pop("pipeline", None) is not None:
                logger.warning(
                    f"pp_degree={self.pp_degree}: model {name} has no pipeline "
                    f"support — pp mesh axis created but layers are NOT "
                    f"partitioned (use a ViT variant or distributed.pipeline "
                    f"directly)")
                retried = True
            if not retried:
                raise
            self.model = build_model(model_cfg)
        if self.pp_degree > 1 and getattr(self.model, "pipeline", False):
            logger.info(f"pipeline parallelism: pp={self.pp_degree}, "
                        f"{getattr(self.model, 'num_microbatches', '?')} "
                        f"microbatches (GPipe over the pp mesh axis)")

        # ---- init variables (jitted: one XLA program instead of
        # op-by-op dispatch — critical on tunneled platforms)
        import functools

        rng = jax.random.PRNGKey(self.seed)
        init_rngs = {"params": rng, "dropout": rng, "shuffle": rng, "masking": rng, "aug": rng, "mixup": rng}
        sample = self._sample_batch()
        if self.criterion is None and self.train_dataloader is not None:
            variables = jax.jit(functools.partial(self.model.init, train=True))(init_rngs, sample)
        else:
            x = sample[0] if isinstance(sample, (tuple, list)) else sample
            variables = jax.jit(functools.partial(self.model.init, train=(mode == "train")))(init_rngs, x)
        params = variables["params"]
        self.model_state = {k: v for k, v in variables.items() if k != "params"}
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
        logger.info(f"model {name}: {n_params / 1e6:.2f}M params, "
                    f"compute dtype {self.policy.compute_dtype.__name__}")

        # ---- optimizer / scheduler
        opt_cfg = dict(config.get("Optimizer", {}) or {"name": "Momentum"})
        lrs_cfg = dict(config.get("LRScheduler", {}) or {"name": "Constant", "learning_rate": 0.0})
        self.lr_fn = build_lr_scheduler(
            lrs_cfg, self.epochs, max(self.steps_per_epoch, 1), self.global_batch_size if hasattr(self, "global_batch_size") else 256
        )
        grad_clip_cfg = opt_cfg.pop("grad_clip", None)
        self.grad_clip = None
        if grad_clip_cfg:
            gc_kwargs = {k: v for k, v in grad_clip_cfg.items() if k != "name"}
            self.grad_clip = ClipGradByGlobalNorm(**gc_kwargs)
        frozen = list(self.model.frozen_patterns()) if hasattr(self.model, "frozen_patterns") else []
        # registry variant names (e.g. ViT_base_patch16_224) carry no
        # 'depth' key — fall back to the built model so layerwise_decay
        # is not silently a no-op on exactly the finetune configs
        num_layers = int(model_cfg.get("depth", 0) or getattr(self.model, "depth", 0) or 0)
        if num_layers == 0 and (opt_cfg.get("layerwise_decay") or 0):
            logger.warning("Optimizer.layerwise_decay is set but the model depth is "
                           "unknown (num_layers=0) — layer decay will be a no-op")
        if hasattr(self.model, "optimizer_overrides"):
            overrides = self.model.optimizer_overrides()
            if overrides:
                opt_cfg["param_group"] = list(opt_cfg.get("param_group", []) or []) + overrides
        # init-sync EMA targets BEFORE the optimizer sees params: the
        # copy can introduce keys the target tower never traces (e.g.
        # momentum/predictor — inert on the key path) and the optimizer
        # group assignment must cover them
        # (reference param_k.set_value(param_q), moco.py:69-71)
        if hasattr(self.model, "ema_map"):
            for src, dst, _ in self.model.ema_map():
                params = dict(params)
                params[dst] = jax.tree_util.tree_map(jnp.copy, params[src])
        self.optimizer = build_optimizer(
            opt_cfg, params, frozen_patterns=frozen, num_layers=num_layers,
            lr_args=(self.epochs, max(self.steps_per_epoch, 1),
                     getattr(self, "global_batch_size", 256)))
        logger.info(f"optimizer groups: {self.optimizer.describe()}")

        # ---- pretrained (params + bundled BN running stats if present)
        if self.pretrained_model:
            load_report = {}
            params, self.model_state = io.load_pretrained_into(
                self.pretrained_model, params, self.model_state,
                report=load_report)
            # re-sync EMA targets from the loaded online tower (the
            # reference syncs after weight load, moco.py:69-71) — but only
            # towers the pretrained file did NOT itself cover: a converted
            # two-tower checkpoint (continuing pretraining) carries a
            # diverged momentum encoder that must not be clobbered
            if hasattr(self.model, "ema_map"):
                from flax import traverse_util

                loaded = load_report.get("loaded", set())
                for src, dst, _ in self.model.ema_map():
                    flat_dst = traverse_util.flatten_dict(params[dst], sep="/")
                    missing = [p for p in flat_dst
                               if f"{dst}/{p}" not in loaded]
                    if not missing:
                        logger.info(
                            f"pretrained file fully covers EMA tower '{dst}' — "
                            f"keeping its loaded weights (no re-sync from '{src}')")
                        continue
                    params = dict(params)
                    if len(missing) == len(flat_dst):
                        params[dst] = jax.tree_util.tree_map(jnp.copy, params[src])
                        continue
                    # partial coverage: only the leaves the file did NOT
                    # provide are re-synced from the online tower — a
                    # blanket keep would leave fresh-random leaves in the
                    # momentum target; a blanket re-sync would clobber the
                    # diverged weights the file did carry
                    logger.info(
                        f"pretrained file covers {len(flat_dst) - len(missing)}/"
                        f"{len(flat_dst)} leaves of EMA tower '{dst}' — "
                        f"re-syncing the {len(missing)} uncovered from '{src}'")
                    flat_src = traverse_util.flatten_dict(params[src], sep="/")
                    orphans = [p for p in missing if p not in flat_src]
                    if orphans:
                        # a leaf in neither the pretrained file nor the
                        # online tower means the towers' structures
                        # disagree — surface it instead of silently
                        # leaving fresh-random init
                        logger.warning(
                            f"EMA tower '{dst}': {len(orphans)} leaves are in "
                            f"neither the pretrained file nor online tower "
                            f"'{src}' and stay at fresh init: "
                            f"{orphans[:5]}{'...' if len(orphans) > 5 else ''}")
                    for p in missing:
                        if p in flat_src:
                            flat_dst[p] = jnp.copy(flat_src[p])
                    params[dst] = traverse_util.unflatten_dict(flat_dst, sep="/")

        # ---- EMA pairs (momentum encoders; init-sync happened above) +
        # full-model EMA
        self.ema_pairs = []
        if hasattr(self.model, "ema_map"):
            for src, dst, ema_cfg in self.model.ema_map():
                self.ema_pairs.append((src, dst, ema_momentum_schedule(ema_cfg, self.total_steps)))
        ema_cfg = config.get("EMA", None)
        self.full_ema_decay = None
        if ema_cfg:
            decay = float(ema_cfg["decay"])
            thres = int(ema_cfg.get("thres_steps", 0))
            if thres > 0:
                self.full_ema_decay = lambda step, d=decay, t=thres: jnp.where(step < t, 0.0, d)
            else:
                self.full_ema_decay = decay

        # Paddle framework flags are accepted for config compatibility
        # but have no XLA equivalent (reference engine.py:91-99)
        if g.get("flags"):
            logger.info(f"Global.flags accepted for config compat (no-op on TPU): "
                        f"{list(g['flags'])}")

        # ---- post-step param transforms (SwAV prototype renorm etc.)
        self.param_transforms = list(self.model.param_transforms()) \
            if hasattr(self.model, "param_transforms") else []
        if self.param_transforms:
            import re as _re

            from flax import traverse_util as _tu

            flat = _tu.flatten_dict(params, sep="/")
            for pat, fn in self.param_transforms:
                for p in list(flat):
                    if _re.search(pat, p):
                        flat[p] = fn(flat[p])
            params = _tu.unflatten_dict(flat, sep="/")

        # ---- train state (replicated params for now; fsdp shards later)
        opt_state = self.optimizer.init(params)
        scaler_state = self.scaler.init() if self.scaler else None
        ema_params = jax.tree_util.tree_map(lambda x: x, params) if self.full_ema_decay else None
        state = TrainState.create(params, self.model_state, opt_state,
                                  jax.random.fold_in(rng, jax.process_index() * 0 + 1),
                                  scaler_state=scaler_state, ema_params=ema_params)
        if fsdp_degree > 1 or mp_degree > 1:
            # ZeRO/megatron placement (replaces the reference's
            # ShardingStage2 wrapper + ring-TP layers, SURVEY §2.3)
            from ..distributed.sharding import (MOE_SHARD_RULES, VIT_TP_RULES,
                                                shard_train_state)

            self.state, self.state_shardings = shard_train_state(
                state, self.mesh, tp_rules=VIT_TP_RULES + MOE_SHARD_RULES,
                use_fsdp=fsdp_degree > 1
            )
            logger.info(f"sharded train state over mesh {dict(self.mesh.shape)} "
                        f"(fsdp={fsdp_degree}, tp={mp_degree})")
        elif self.pp_degree > 1 and getattr(self.model, "pipeline", False):
            from ..distributed.sharding import pipeline_state_shardings

            self.state, self.state_shardings = pipeline_state_shardings(
                state, self.mesh, self.pp_degree)
            logger.info(f"placed stacked block params/moments/EMA on the pp "
                        f"axis (pp={self.pp_degree})")
        else:
            self.state = jax.device_put(state, NamedSharding(self.mesh, P()))

        # ---- compiled steps
        self.train_step = jax.jit(
            make_train_step(
                self.model,
                self.optimizer,
                self.lr_fn,
                criterion=self.criterion,
                grad_clip=self.grad_clip,
                scaler=self.scaler,
                accum_steps=self.accum_steps,
                ema_pairs=self.ema_pairs,
                full_ema_decay=self.full_ema_decay,
                param_transforms=self.param_transforms,
            ),
            donate_argnums=0,
        )
        self.eval_step = jax.jit(make_eval_step(self.model))
        # EMA-weights evaluation (reference .pdema checkpoints + EMA
        # eval loop variant, loops/classification_loop.py EMA paths)
        self.eval_step_ema = (
            jax.jit(make_eval_step(self.model, use_ema=True)) if self.full_ema_decay else None
        )
        # fused forward+top-k eval (scalars-only host traffic) when every
        # configured metric is TopkAcc; other metrics (mAP) keep the
        # host logits path
        from ..metrics import TopkAcc as _TopkAcc

        self.eval_metrics_step = None
        self.eval_metrics_step_ema = None
        if self.metric_fns and all(isinstance(m, _TopkAcc) for m in self.metric_fns):
            topk = sorted({k for m in self.metric_fns for k in m.topk})
            self.eval_metrics_step = jax.jit(make_eval_metrics_step(self.model, topk))
            if self.full_ema_decay:
                self.eval_metrics_step_ema = jax.jit(
                    make_eval_metrics_step(self.model, topk, use_ema=True))

        # ---- user hooks (v110 Hook extension point, hooks.py)
        from .hooks import HookList, build_hooks

        self.hooks = HookList(build_hooks(g.get("hooks")))

        # ---- loops (reference: eval('loops.<name>'), engine.py:301-313)
        loop_name = g.get("train_loop", None) or (
            "ClassificationTrainingEpochLoop" if self.criterion is not None
            else "ContrastiveLearningTrainingEpochLoop"
        )
        self.train_loop = loops_mod.LOOPS[loop_name](self) if mode == "train" else None
        self.eval_loop = (
            loops_mod.ClassificationEvaluationLoop(self) if self.eval_dataloader is not None else None
        )

    # ------------------------------------------------------------------
    def _sample_batch(self):
        """One small host batch for model.init (shapes only)."""
        loader = self.train_dataloader or self.eval_dataloader
        assert loader is not None, "no dataloader configured"
        ds = loader.dataset
        sample = ds[0]
        from ..data.loader import default_collate

        return self._prepare_batch(default_collate([sample, sample]))

    def _prepare_batch(self, batch):
        """SSL datasets yield ((v1, v2), label) or multi-crop lists; the
        contrastive loops strip the label (reference
        contrastive_learning_loop.py:67-88)."""
        if self.criterion is None and isinstance(batch, tuple) and len(batch) == 2 \
                and isinstance(batch[0], (tuple, list)) and getattr(batch[1], "ndim", 2) <= 1:
            return batch[0]
        return batch

    def shard_batch(self, batch):
        batch = self._prepare_batch(batch)

        def put(x):
            x = np.asarray(x)
            spec = P(dist.DATA_AXES, *([None] * (x.ndim - 1)))
            return jax.make_array_from_process_local_data(NamedSharding(self.mesh, spec), x)

        return jax.tree_util.tree_map(put, batch)

    # ------------------------------------------------------------------
    def train(self):
        assert self.mode == "train"
        logger.info(f"start training: {self.epochs} epochs x {self.steps_per_epoch} steps, "
                    f"global batch {self.global_batch_size}, mesh {dict(self.mesh.shape)}")
        self.train_loop.run()
        if self.train_dataloader:
            self.train_dataloader.close()

    def eval(self):
        if self.checkpoint_path:
            self.state = io.load_checkpoint(self.checkpoint_path, self.state)
        return self.eval_loop.run()

    def export(self):
        # export must ship the TRAINED weights (reference export loads
        # the model via utils/io.py:206-226) — load Global.checkpoint
        # exactly like eval() does
        if self.checkpoint_path:
            self.state = io.load_checkpoint(self.checkpoint_path, self.state)
        elif not self.pretrained_model:
            logger.warning("export: neither Global.checkpoint nor "
                           "Global.pretrained_model set — exporting fresh-init weights")
        if self.criterion is None and self.train_dataloader is not None:
            raise ValueError(
                "export targets inference models (logits/features). For an "
                "SSL pretrain config, first extract the backbone "
                "(passl_tpu.tools.extract_weights) and export a "
                "Classification/LinearProbe config over it."
            )
        # Export.formats: ["stablehlo"] (default) and/or ["tf"] — the TF
        # SavedModel is the second serving runtime (reference
        # predictor.py:35-70 paddle-inference vs onnxruntime dispatch)
        export_cfg = self.config.get("Export", {})
        sample = self._sample_batch()
        x = sample[0] if isinstance(sample, (tuple, list)) else sample
        # The exported shape spec is batch-polymorphic, so the slice size
        # only matters for int8 PTQ: static activation scales are per-tensor
        # abs-max over this batch, and a single image underestimates the
        # range (the fidelity numbers in tests/test_quant.py use 32-sample
        # calibration). Keep up to 32 real loader samples when quantizing;
        # one suffices for the pure shape-spec path.
        n_calib = 32 if export_cfg.get("quantize") else 1
        x = jnp.asarray(np.asarray(x)[:n_calib])
        variables = {"params": self.state.params, **self.state.model_state}
        formats = tuple(export_cfg.get("formats", ("stablehlo",)))
        return io.export(self.model, variables, x, self.output_dir,
                         name=self.config.get("Model", {}).get("name", "inference"),
                         formats=formats,
                         quantize=export_cfg.get("quantize", None))
