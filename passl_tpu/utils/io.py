"""Checkpoint save/load + pretrained weight loading + export.

Capability parity with reference `passl/utils/io.py`: save model params
+ optimizer state (+scaler) + EMA + metric/timestamp states (:115-168),
`best`/`latest` prefix copies, GC keeping newest `max_num_checkpoint`
(:173-203), resume (:54-99), export (:206-226).

The reference splits distributed optimizer state into per-rank files;
here a checkpoint is a host-independent msgpack of the *global* pytree
(params are gathered; fine for single-host). Multi-host / sharded state
goes through orbax instead: `save_checkpoint_auto` dispatches to
`save_sharded_checkpoint` whenever the state is mesh-sharded or the run
is multi-process, and `load_checkpoint` restores either format.
"""
from __future__ import annotations

import glob
import json
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization, traverse_util

from . import logger


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def state_is_sharded(state) -> bool:
    """True when the msgpack gather path would be wrong or fail: the run
    spans multiple processes, or some leaf is mesh-sharded (not fully
    replicated) across >1 device."""
    if jax.process_count() > 1:
        return True
    for leaf in jax.tree_util.tree_leaves(state):
        sh = getattr(leaf, "sharding", None)
        if sh is None:
            continue
        try:
            if len(sh.device_set) > 1 and not leaf.is_fully_replicated:
                return True
        except Exception:
            continue
    return False


def save_checkpoint_auto(
    state,
    output_dir: str,
    prefix: str = "latest",
    max_num_checkpoint: int = 3,
    metrics: Optional[Dict[str, float]] = None,
) -> str:
    """Dispatch: orbax per-shard save for sharded/multi-process state
    (every process must call this), msgpack otherwise (reference
    per-rank `_rank{i}.pdopt` split, io.py:102-168)."""
    if state_is_sharded(state):
        path = save_sharded_checkpoint(state, output_dir, prefix)
        if jax.process_index() == 0:
            states = {"metric": metrics or {}, "save_time": time.time(),
                      "step": int(state.step)}
            with open(os.path.join(output_dir, f"{prefix}.states"), "w") as f:
                json.dump(states, f)
            _gc_checkpoints(output_dir, max_num_checkpoint)
        return path
    return save_checkpoint(state, output_dir, prefix, max_num_checkpoint, metrics)


def save_checkpoint(
    state,
    output_dir: str,
    prefix: str = "latest",
    max_num_checkpoint: int = 3,
    metrics: Optional[Dict[str, float]] = None,
) -> str:
    """Save TrainState → `{output_dir}/{prefix}.ckpt` (+ .states json)."""
    if jax.process_index() != 0:
        return ""
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, f"{prefix}.ckpt")
    blob = serialization.to_bytes(_to_host(state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    states = {"metric": metrics or {}, "save_time": time.time(), "step": int(state.step)}
    with open(os.path.join(output_dir, f"{prefix}.states"), "w") as f:
        json.dump(states, f)
    _gc_checkpoints(output_dir, max_num_checkpoint)
    logger.info(f"saved checkpoint {path} (step {int(state.step)})")
    return path


def _gc_checkpoints(output_dir: str, keep: int):
    """Keep newest `keep` epoch-numbered checkpoints (never touches
    best/latest), reference io.py:173-203."""
    import shutil

    cands = []
    for p in glob.glob(os.path.join(output_dir, "epoch_*.ckpt")) + glob.glob(
        os.path.join(output_dir, "epoch_*.orbax")
    ):
        cands.append((os.path.getmtime(p), p))
    for _, p in sorted(cands)[:-keep] if keep > 0 else []:
        if os.path.isdir(p):
            shutil.rmtree(p)
        else:
            os.remove(p)
        st = p.rsplit(".", 1)[0] + ".states"
        if os.path.exists(st):
            os.remove(st)


def load_checkpoint(path: str, state):
    """Resume a TrainState saved by save_checkpoint (msgpack file or
    orbax directory)."""
    if os.path.isdir(path):
        return load_sharded_checkpoint(path, state)
    if not os.path.exists(path):
        # a sharded run may have written `<prefix>.orbax` where the
        # config says `<prefix>.ckpt` (save_checkpoint_auto dispatch)
        orbax_alt = path.rsplit(".", 1)[0] + ".orbax" if path.endswith(".ckpt") else path + ".orbax"
        if os.path.isdir(orbax_alt):
            return load_sharded_checkpoint(orbax_alt, state)
        if os.path.exists(path + ".ckpt"):
            path = path + ".ckpt"
    with open(path, "rb") as f:
        blob = f.read()
    restored = serialization.from_bytes(state, blob)
    logger.info(f"resumed from {path} (step {int(restored.step)})")
    return restored


def save_sharded_checkpoint(state, output_dir: str, prefix: str = "latest") -> str:
    """Multi-host/sharded checkpoint via orbax: each host writes its
    addressable shards (replaces the reference's per-rank `_rank{i}.pdopt`
    split, io.py:102-168). Use when the train state is FSDP/TP sharded
    across hosts; single-host runs can keep the msgpack path."""
    import shutil

    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(output_dir, f"{prefix}.orbax"))
    # atomic: write to a tmp dir, then swap — the previous checkpoint
    # survives a crash mid-save (the preemption path depends on this)
    tmp = path + ".tmp"
    if os.path.exists(tmp) and jax.process_index() == 0:
        shutil.rmtree(tmp)
    _barrier("pre_save")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(tmp, state)
    ckptr.wait_until_finished()
    _barrier("post_save")
    if jax.process_index() == 0:
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
    _barrier("post_swap")
    logger.info(f"saved sharded checkpoint {path} (step {int(state.step)})")
    return path


def _barrier(tag: str):
    """Cross-process sync so no host races the rmtree/rename swap."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(f"passl_ckpt_{tag}")


def load_sharded_checkpoint(path: str, state):
    """Restore an orbax checkpoint onto the (possibly sharded) layout of
    `state` — shards land directly on their devices."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), state)
    logger.info(f"resumed sharded checkpoint from {path} (step {int(restored.step)})")
    return restored


def save_params(params, path: str):
    if jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(_to_host(params)))
    os.replace(tmp, path)


def load_pretrained_into(path: str, params, model_state=None, report=None):
    """Load pretrained params, tolerating missing/extra keys and shape
    mismatches (reference `Model.load_pretrained` semantics: warn and
    keep the fresh init for mismatches — e.g. a new classifier head).

    Files saved by extract_weights may bundle BN running statistics as
    {"params": ..., "batch_stats": ...}; when `model_state` is given,
    matching batch_stats entries are merged into it (returning
    (params, model_state)), otherwise only params are returned.

    When `report` is a dict, it is populated with "loaded" — the set of
    flattened ("/"-joined) param keys actually taken from the file —
    so callers (e.g. EMA re-sync in the engine) can tell which towers
    the pretrained file really covered."""
    with open(path, "rb") as f:
        blob = f.read()
    loaded = serialization.msgpack_restore(blob)
    loaded_bstats = None
    if isinstance(loaded, dict) and set(loaded) <= {"params", "batch_stats"} and "params" in loaded:
        loaded_bstats = loaded.get("batch_stats")
        loaded = loaded["params"]
    flat_new = traverse_util.flatten_dict(params, sep="/")
    flat_loaded = traverse_util.flatten_dict(loaded, sep="/")
    out = {}
    missing, mismatched = [], []
    for k, v in flat_new.items():
        if k in flat_loaded:
            lv = flat_loaded[k]
            if tuple(np.shape(lv)) == tuple(v.shape):
                out[k] = jax.numpy.asarray(lv, v.dtype)
            elif k.endswith("pos_embed") and np.ndim(lv) == 3 and v.ndim == 3 \
                    and np.shape(lv)[-1] == v.shape[-1]:
                # finetune at a new resolution: bicubic-resize the grid
                # part (reference vision_transformer.py:365-427)
                from ..models.vision_transformer import interpolate_pos_embed

                n_prefix = 1 if (v.shape[1] - 1) ** 0.5 % 1 == 0 else 0
                new_grid = int(round((v.shape[1] - n_prefix) ** 0.5))
                out[k] = interpolate_pos_embed(
                    jax.numpy.asarray(lv, v.dtype), new_grid, num_prefix=n_prefix)
                logger.info(f"pretrained load: interpolated {k} "
                            f"{np.shape(lv)} -> {tuple(v.shape)}")
            else:
                mismatched.append(k)
                out[k] = v
        else:
            missing.append(k)
            out[k] = v
    extra = [k for k in flat_loaded if k not in flat_new]
    if missing:
        logger.warning(f"pretrained load: {len(missing)} params not found (kept init): {missing[:5]}...")
    if mismatched:
        logger.warning(f"pretrained load: {len(mismatched)} shape mismatches (kept init): {mismatched[:5]}")
    if extra:
        logger.warning(f"pretrained load: {len(extra)} unused keys in file")
    logger.info(f"loaded pretrained weights from {path}")
    if report is not None:
        report["loaded"] = {k for k in flat_new
                            if k in flat_loaded and k not in mismatched}
    new_params = traverse_util.unflatten_dict(out, sep="/")
    if model_state is None:
        return new_params
    if loaded_bstats:
        bs_new = traverse_util.flatten_dict(model_state.get("batch_stats", {}), sep="/")
        bs_loaded = traverse_util.flatten_dict(loaded_bstats, sep="/")
        hit = 0
        for k in bs_new:
            if k in bs_loaded and tuple(np.shape(bs_loaded[k])) == tuple(bs_new[k].shape):
                bs_new[k] = jax.numpy.asarray(bs_loaded[k], bs_new[k].dtype)
                hit += 1
        model_state = dict(model_state)
        model_state["batch_stats"] = traverse_util.unflatten_dict(bs_new, sep="/")
        logger.info(f"loaded {hit} pretrained BN running-stat tensors")
    return new_params, model_state


def export(model, variables, sample_input, output_dir: str, name: str = "inference",
           formats=("stablehlo",), quantize=None):
    """Export a serving artifact (reference export: paddle.jit.save /
    onnx, io.py:206-226; serving dispatch predictor.py:35-70 chooses
    paddle-inference OR onnxruntime).

    Formats:
    - "stablehlo": jax.export bytes + params msgpack, loaded by the
      Predictor shim (engine/inference.py) — the JAX-side runtime.
    - "tf": TensorFlow SavedModel via jax2tf native serialization —
      the SECOND runtime: the artifact embeds StableHLO executed by
      TF's XlaCallModule and serves from a process that imports only
      tensorflow (no passl_tpu, no jax) — the TPU-world analogue of
      the reference's ONNXRuntime alternative.

    quantize="int8" bakes W8A8 post-training quantization into the
    artifact (nn/quant.py): Dense and plain 2-D Conv weights ship int8
    with per-channel scales, activation scales are calibrated
    statically on the sample batch (engine.export feeds a real loader
    batch), matmuls/convs hit the MXU's int8 path. Both runtimes serve
    the quantized graph unchanged. Measured: ViT-B 1.13x, R50 1.11x
    vs bf16 on-chip.
    """
    from jax import export as jexport
    import jax.numpy as jnp

    os.makedirs(output_dir, exist_ok=True)

    if quantize is None:
        def fwd(params, x):
            return model.apply({"params": params, **{k: v for k, v in variables.items() if k != "params"}},
                               x, train=False)

        params = variables["params"]
    elif quantize == "int8":
        from ..nn import quant

        # static activation scales calibrated on the full sample batch
        # (engine.export feeds a real batch from the dataloader)
        fwd, params = quant.quantize_for_inference(
            model, variables, sample_input, train=False)
        logger.info("export: baked int8 W8A8 quantization into the artifact")
    else:
        raise ValueError(f"unknown Export.quantize: {quantize!r} (use 'int8')")
    ret = None
    if "stablehlo" in formats:
        # symbolic batch dim so the served artifact accepts any batch size
        (b,) = jexport.symbolic_shape("b")
        exp = jexport.export(jax.jit(fwd))(
            jax.tree_util.tree_map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params),
            jax.ShapeDtypeStruct((b, *sample_input.shape[1:]), sample_input.dtype),
        )
        with open(os.path.join(output_dir, f"{name}.stablehlo"), "wb") as f:
            f.write(exp.serialize())
        save_params(params, os.path.join(output_dir, f"{name}.params"))
        logger.info(f"exported model to {output_dir}/{name}.stablehlo")
        ret = os.path.join(output_dir, f"{name}.stablehlo")
    if "tf" in formats:
        tf_path = _export_tf_savedmodel(fwd, params, sample_input, output_dir, name)
        ret = ret or tf_path
    return ret


def _export_tf_savedmodel(fwd, params, sample_input, output_dir: str, name: str):
    """TF SavedModel with a batch-polymorphic `serve` signature."""
    import numpy as np
    import tensorflow as tf
    from jax.experimental import jax2tf

    tf_fwd = jax2tf.convert(fwd, polymorphic_shapes=[None, "b, ..."],
                            native_serialization=True)
    params_np = jax.tree_util.tree_map(np.asarray, params)
    params_vars = tf.nest.map_structure(tf.Variable, params_np)
    module = tf.Module()
    # keep variables reachable so SavedModel tracks (and restores) them
    module._params = tf.nest.flatten(params_vars)
    module.serve = tf.function(
        lambda x: tf_fwd(params_vars, x),
        autograph=False,
        input_signature=[tf.TensorSpec([None, *sample_input.shape[1:]],
                                       tf.as_dtype(np.dtype(sample_input.dtype)))],
    )
    path = os.path.join(output_dir, f"{name}.tf")
    tf.saved_model.save(module, path)
    logger.info(f"exported TF SavedModel (second serving runtime) to {path}")
    return path
