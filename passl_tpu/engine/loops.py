"""Training / evaluation loops (host orchestration).

Capability parity with reference `passl/engine/loops/`:
`_Loop` (loop.py:31-130 — timing meters, eval cadence, rich log line),
`TrainingEpochLoop` (loop.py:133-375 — resume, set_epoch, per-epoch
train, eval trigger, best/latest checkpoints, max_train_step exit),
`ClassificationTrainingEpochLoop` / `ContrastiveLearningTrainingEpochLoop`
(criterion-driven vs model-returns-loss — here both reduce to whether
the engine built the step with a criterion), and
`ClassificationEvaluationLoop` (classification_loop.py:102-263 —
distributed eval with padded-tail truncation, best-metric tracking).

The hot loop is thin by design: every numeric decision lives inside the
jitted step; the host only pumps sharded batches and reads metrics at
print boundaries (reading forces a device sync, so we avoid it on
non-log steps).
"""
from __future__ import annotations

import datetime
import time
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..utils import io, logger
from ..utils.misc import SmoothedValue


_MEM_STATS_OK: Optional[bool] = None  # None = unprobed; False = backend has none

_REPLICATORS: Dict[Any, Any] = {}  # mesh -> jitted all-gather-to-replicated


def _replicator(_=None):
    """Cached jit of the identity-with-replicated-out-sharding used to
    materialize global eval outputs on every process. A fresh
    `jax.jit(lambda ...)` per batch would be a new function identity and
    re-trace every call."""
    from .. import distributed as dist
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = dist.get_mesh()
    if mesh not in _REPLICATORS:
        _REPLICATORS[mesh] = jax.jit(
            lambda x: x, out_shardings=NamedSharding(mesh, P()))
    return _REPLICATORS[mesh]


def _peak_mem_str() -> str:
    """' max_mem: X.XX GB' from the device allocator (reference logs
    max_memory_allocated per line, loop.py:102-118); empty string where
    the backend reports no memory stats (CPU, tunneled test rigs — the
    negative probe is cached so no per-log-line device RPC is retried)."""
    global _MEM_STATS_OK
    if _MEM_STATS_OK is False:
        return ""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        if not peak:
            _MEM_STATS_OK = False
            return ""
        _MEM_STATS_OK = True
        return f" max_mem: {peak / 2**30:.2f} GB"
    except Exception:
        _MEM_STATS_OK = False
        return ""


class _Loop:
    def __init__(self, engine):
        self.engine = engine
        self.time_info = {
            "batch_cost": SmoothedValue(window_size=engine.print_batch_step),
            "reader_cost": SmoothedValue(window_size=engine.print_batch_step),
        }
        self.best_metric = {"metric": float("-inf"), "epoch": 0, "global_step": 0}

    def reset_time_info(self):
        for v in self.time_info.values():
            v.reset()

    def log_line(self, epoch: int, step_in_epoch: int, steps_per_epoch: int, metrics: Dict[str, Any]):
        e = self.engine
        m = {k: float(v) for k, v in metrics.items()}
        ips = e.global_batch_size / max(self.time_info["batch_cost"].avg, 1e-9)
        global_step = int(e.state.step)
        remaining = e.total_steps - global_step
        eta = datetime.timedelta(seconds=int(remaining * self.time_info["batch_cost"].global_avg))
        loss_str = " ".join(f"{k}: {v:.5f}" for k, v in m.items() if k != "lr")
        logger.info(
            f"[Train][Epoch {epoch}/{e.epochs}][Iter: {step_in_epoch}/{steps_per_epoch}] "
            f"lr: {m.get('lr', 0):.8f} {loss_str} "
            f"batch_cost: {self.time_info['batch_cost'].avg:.5f}s "
            f"reader_cost: {self.time_info['reader_cost'].avg:.5f}s "
            f"ips: {ips:.2f} imgs/s eta: {eta}{_peak_mem_str()}"
        )
        for k, v in m.items():
            logger.scaler(f"train/{k}", v, global_step, e.writer)


class TrainingEpochLoop(_Loop):
    def run(self):
        e = self.engine
        start_epoch = 1
        skip_steps = 0
        if e.checkpoint_path:
            e.state = io.load_checkpoint(e.checkpoint_path, e.state)
            spe = max(e.steps_per_epoch, 1)
            done = int(e.state.step)
            start_epoch = done // spe + 1
            # mid-epoch resume: fast-forward past the already-trained
            # batches of the partial epoch instead of replaying them
            # (the reference replays the partial epoch, loop.py:358-375)
            skip_steps = done % spe
            if skip_steps:
                start_epoch = done // spe + 1
                logger.info(f"mid-epoch resume: skipping {skip_steps} "
                            f"already-trained batches of epoch {start_epoch}")
        # preemption safety (beyond the reference, which only resumes):
        # SIGTERM/SIGINT set a flag; the loop finishes the in-flight
        # step, checkpoints `latest`, and exits 0 so a relaunch resumes
        self._interrupted = False
        old_handlers = {}
        if getattr(e, "save_on_interrupt", True):
            import signal

            def _on_signal(signum, frame):
                if self._interrupted:
                    # second signal: the step boundary isn't coming
                    # (hung compile/transfer) — escalate to default
                    import signal as _s

                    logger.warning(f"signal {signum} again: escalating")
                    _s.signal(signum, old_handlers.get(signum, _s.SIG_DFL))
                    raise KeyboardInterrupt
                self._interrupted = True
                logger.warning(f"signal {signum}: checkpointing and exiting "
                               f"at the next step boundary (repeat to force)")

            for sig in (signal.SIGTERM, signal.SIGINT):
                try:
                    old_handlers[sig] = signal.signal(sig, _on_signal)
                except ValueError:  # not the main thread
                    break

        e.hooks.call("train_begin", e)
        for epoch in range(start_epoch, e.epochs + 1):
            e.train_dataloader.set_epoch(epoch)
            e.hooks.call("epoch_begin", e, epoch)
            stop = self.train_one_epoch(epoch, skip_steps=skip_steps)
            skip_steps = 0
            e.hooks.call("epoch_end", e, epoch)
            if e.eval_during_train and e.eval_unit == "epoch" and epoch % e.eval_interval == 0:
                self._run_eval(epoch)
            # every process enters the save — the orbax path (selected
            # automatically for sharded/multi-process state) writes
            # per-host shards; the msgpack path no-ops off rank 0.
            # latest/epoch saves follow save_interval (a full-state fetch
            # is expensive on tunneled hosts); a final latest is always
            # written after the loop, and stop/interrupt saves below.
            if stop or (e.save_interval > 0 and epoch % e.save_interval == 0):
                io.save_checkpoint_auto(e.state, e.output_dir, prefix="latest",
                                        max_num_checkpoint=e.max_num_checkpoint)
                if not stop:
                    io.save_checkpoint_auto(e.state, e.output_dir, prefix=f"epoch_{epoch}",
                                            max_num_checkpoint=e.max_num_checkpoint)
            if stop:
                if self._interrupted:
                    logger.info("interrupted: checkpoint saved, exiting for resume")
                else:
                    logger.info(f"reached max_train_step {e.max_train_step}, stopping")
                break
        else:
            # loop completed all epochs: guarantee a final latest even
            # when save_interval skipped the last epoch
            if e.epochs >= start_epoch and (e.save_interval <= 0 or e.epochs % e.save_interval != 0):
                io.save_checkpoint_auto(e.state, e.output_dir, prefix="latest",
                                        max_num_checkpoint=e.max_num_checkpoint)
        e.hooks.call("train_end", e)
        if old_handlers:
            import signal

            for sig, h in old_handlers.items():
                signal.signal(sig, h)

    last_metrics: Optional[Dict[str, Any]] = None  # for CI golden checks
    _interrupted: bool = False

    def train_one_epoch(self, epoch: int, skip_steps: int = 0) -> bool:
        e = self.engine
        self.reset_time_info()
        tic = time.perf_counter()
        metrics = None
        steps_per_epoch = len(e.train_dataloader)
        if skip_steps:
            # index-level skip: the sampler slice is dropped before any
            # fetch/decode work happens
            e.train_dataloader.set_skip(skip_steps)
        for i, batch in enumerate(e.train_dataloader, start=skip_steps):
            self.time_info["reader_cost"].update(time.perf_counter() - tic)
            gbatch = e.shard_batch(batch)
            e.state, metrics = e.train_step(e.state, gbatch)
            if (i + 1) % e.print_batch_step == 0:
                # force sync only at log boundaries (log_line fetches the
                # metric values; a value fetch is the only true barrier
                # on tunneled platforms — block_until_ready may not wait)
                self.time_info["batch_cost"].update((time.perf_counter() - tic))
                self.log_line(epoch, i + 1, steps_per_epoch, metrics)
            else:
                self.time_info["batch_cost"].update(time.perf_counter() - tic)
            tic = time.perf_counter()
            global_step = (epoch - 1) * steps_per_epoch + i + 1
            e.hooks.call("iter_end", e, global_step, metrics)
            if e.profiler_options:
                from ..utils import profiler

                profiler.add_profiler_step(e.profiler_options, global_step)
            if e.eval_during_train and e.eval_unit == "step" and global_step % e.eval_interval == 0:
                self._run_eval(epoch)
            if self._interrupted or (e.max_train_step and global_step >= e.max_train_step):
                self.last_metrics = metrics
                return True
        self.last_metrics = metrics
        return False

    def _run_eval(self, epoch: int):
        e = self.engine
        if e.eval_loop is None:
            return
        metric = e.eval_loop.run()
        e.hooks.call("eval_end", e, metric)
        if metric is not None and metric > self.best_metric["metric"]:
            self.best_metric.update(metric=metric, epoch=epoch, global_step=int(e.state.step))
            io.save_checkpoint_auto(e.state, e.output_dir, prefix="best",
                                    max_num_checkpoint=e.max_num_checkpoint,
                                    metrics={"metric": metric})
        logger.info(f"[Eval][Epoch {epoch}] best metric: {self.best_metric['metric']:.5f} "
                    f"(epoch {self.best_metric['epoch']})")


class ClassificationTrainingEpochLoop(TrainingEpochLoop):
    """Parity alias: the criterion-driven step is built by the engine."""


class ContrastiveLearningTrainingEpochLoop(TrainingEpochLoop):
    """Parity alias: model returns the loss dict itself."""


class SimSiamTrainingEpochLoop(ContrastiveLearningTrainingEpochLoop):
    """Parity alias (reference has a dedicated loop for two-optimizer
    SimSiam; our param-group optimizer expresses it in one)."""


class ClassificationEvaluationLoop(_Loop):
    """Distributed eval: per-batch on-device metrics, exact-count
    aggregation (the reference all_gathers then truncates the padded
    tail; here the sampler wraps, so we weight by true remaining count)."""

    def __init__(self, engine):
        super().__init__(engine)

    @staticmethod
    def _host_rows(garr, rank: int, bs: int, nproc: int) -> np.ndarray:
        """Materialize this process's row block of a global array (the
        whole array single-process)."""
        if nproc == 1:
            return np.asarray(garr)
        rep = _replicator(None)(garr)
        return np.asarray(rep)[rank * bs:(rank + 1) * bs]

    def run(self) -> Optional[float]:
        import jax

        e = self.engine
        if e.eval_dataloader is None:
            return None
        n_total = len(e.eval_dataloader.dataset)
        # per-process share of the REAL samples: the sampler strides
        # rank::P over a wrap-padded index list, so this process's
        # stream holds ceil((n_total - rank)/P) non-duplicate samples,
        # all before any wrapped tail — capping `take` here masks both
        # the ragged-tail padding and the wrap duplicates (reference
        # trims the oversampled tail after all_gather,
        # classification_loop.py:213-218)
        nproc, rank = jax.process_count(), jax.process_index()
        local_total = max(0, -(-(n_total - rank) // nproc))
        # Loop-termination counter must be IDENTICAL on every process:
        # each iteration below runs cross-process collectives
        # (metrics_step / eval_step on globally-sharded arrays), so a
        # rank that breaks one iteration earlier than its peers (shares
        # differ by 1 when nproc does not divide n_total) deadlocks the
        # rest. Iterate to rank 0's share (the max) everywhere; ranks
        # whose own share is exhausted still execute the step with an
        # all-False valid mask.
        max_local = -(-n_total // nproc)
        stepped = 0       # samples worth of iterations driven (global counter)
        seen = 0          # local real samples consumed (loop accounting)
        global_seen = 0.0  # device-counted global valid samples (denominator)
        sums: Dict[str, float] = {}
        key_order = None      # rank-uniform metric key set (host-logits path)
        layout_checked = False
        tic = time.perf_counter()
        eval_ema = getattr(e, "eval_step_ema", None)
        metrics_step = getattr(e, "eval_metrics_step", None)
        metrics_step_ema = getattr(e, "eval_metrics_step_ema", None)
        full_bs = None
        for batch in e.eval_dataloader:
            images, labels = batch if not isinstance(batch, dict) else (batch["image"], batch["label"])
            images, labels = np.asarray(images), np.asarray(labels)
            bs = len(labels)
            if stepped >= max_local:
                break
            take = max(0, min(bs, local_total - seen))
            stepped += bs
            if full_bs is None:
                full_bs = bs
            if bs < full_bs:
                # ragged tail: pad up to the steady batch size so the
                # shape stays static (no recompile, and the leading dim
                # keeps dividing the data axes); the valid mask / [:take]
                # keeps the metric exact-count
                pad = full_bs - bs
                images = np.concatenate([images, np.repeat(images[-1:], pad, axis=0)])
                labels = np.concatenate([labels, np.repeat(labels[-1:], pad, axis=0)])
            valid = np.zeros(full_bs, dtype=bool)
            valid[:take] = True
            if metrics_step is not None:
                # device path: forward + top-k fused under jit; only
                # scalar sums come back to host. Sums AND count are
                # global (all shards), so the final divide is
                # process-topology independent.
                gi, gl, gv = e.shard_batch((images, labels.astype(np.int32), valid))
                out = dict(metrics_step(e.state, gi, gl, gv))
                global_seen += float(out.pop("count"))
                for k, v in out.items():
                    sums[k] = sums.get(k, 0.0) + float(v)
                if metrics_step_ema is not None:
                    out_ema = dict(metrics_step_ema(e.state, gi, gl, gv))
                    out_ema.pop("count", None)
                    for k, v in out_ema.items():
                        sums[f"{k}_ema"] = sums.get(f"{k}_ema", 0.0) + float(v)
            else:
                # host-logits path (non-top-k metrics like mAP): the
                # eval output is a GLOBAL array; replicate it so every
                # process can materialize it, then score only this
                # process's row block (local sums reduced across
                # processes after the loop)
                gimages = e.shard_batch(images)
                if nproc > 1 and not layout_checked:
                    # _host_rows assumes the global batch is rank-major
                    # (process p owns rows [p*bs, (p+1)*bs)). That holds
                    # for build_mesh over process-major jax.devices();
                    # verify it once with a tagged round-trip instead of
                    # trusting the implicit layout.
                    tag = np.full((len(images),), rank, np.int32)
                    tag_rows = self._host_rows(e.shard_batch(tag), rank,
                                               len(images), nproc)
                    if not (tag_rows == rank).all():
                        raise RuntimeError(
                            "global eval batch is not laid out rank-major; "
                            "_host_rows row-block slicing would mis-assign "
                            "logits to processes")
                    layout_checked = True
                glogits = e.eval_step(e.state, gimages)
                # the replicate in _host_rows is itself a collective —
                # run it on every process even when this rank's share is
                # exhausted (take == 0); only the host-side scoring is
                # skipped then (metric fns may not accept empty arrays)
                rows = self._host_rows(glogits, rank, len(images), nproc)
                if key_order is None:
                    # derive the metric key set RANK-UNIFORMLY by probing
                    # one row (every rank has rows even when take == 0):
                    # the post-loop allgather needs equal-length vectors
                    # on all ranks, so keys must not come from the
                    # locally-populated sums dict
                    probe: Dict[str, float] = {}
                    for metric in e.metric_fns:
                        probe.update(metric(rows[:1], labels[:1]))
                    key_order = sorted(probe)
                    if eval_ema is not None:
                        key_order += [f"{k}_ema" for k in sorted(probe)]
                logits = rows[:take]
                lab = labels[:take]
                if take > 0:
                    for metric in e.metric_fns:
                        for k, v in metric(logits, lab).items():
                            sums[k] = sums.get(k, 0.0) + float(v) * take
                if eval_ema is not None:
                    ema_logits = self._host_rows(eval_ema(e.state, gimages), rank, len(images), nproc)[:take]
                    if take > 0:
                        for metric in e.metric_fns:
                            for k, v in metric(ema_logits, lab).items():
                                sums[f"{k}_ema"] = sums.get(f"{k}_ema", 0.0) + float(v) * take
            seen += take
        if metrics_step is not None:
            denom = global_seen
        else:
            # reference SmoothedValue.synchronize_between_processes
            # semantics (misc.py:110): all-reduce the host-side sums +
            # counts so every process reports the global average
            if nproc > 1:
                from jax.experimental import multihost_utils

                # key_order is derived rank-uniformly above; a rank with
                # an empty local sums dict still gathers the same-length
                # vector as its peers
                keys = key_order if key_order is not None else sorted(sums)
                vec = np.asarray([float(seen)] + [sums.get(k, 0.0) for k in keys],
                                 np.float64)
                allv = np.asarray(multihost_utils.process_allgather(vec)).sum(axis=0)
                seen, sums = int(allv[0]), {k: allv[1 + i] for i, k in enumerate(keys)}
            denom = seen
        if denom == 0:
            return None
        avg = {k: v / denom for k, v in sums.items()}
        cost = time.perf_counter() - tic
        n_shown = int(denom)
        logger.info(
            "[Eval] " + " ".join(f"{k}: {v:.5f}" for k, v in avg.items())
            + f" ({n_shown} samples, {cost:.1f}s, {n_shown / cost:.1f} imgs/s)"
        )
        for k, v in avg.items():
            logger.scaler(f"eval/{k}", v, int(self.engine.state.step), self.engine.writer)
        key = "top1" if "top1" in avg else next(iter(avg))
        return avg[key]


LOOPS = {
    "TrainingEpochLoop": TrainingEpochLoop,
    "ClassificationTrainingEpochLoop": ClassificationTrainingEpochLoop,
    "ContrastiveLearningTrainingEpochLoop": ContrastiveLearningTrainingEpochLoop,
    "SimSiamTrainingEpochLoop": SimSiamTrainingEpochLoop,
    "ClassificationEvaluationLoop": ClassificationEvaluationLoop,
}
