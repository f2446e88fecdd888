"""Inference predictor over exported artifacts.

Capability parity with reference `passl/engine/inference.py:21-70` and
`deploy/utils/predictor.py:35-70` (Predictor over paddle-inference or
ONNXRuntime) + `deploy/python/predict_cls.py`: here the serving
artifact is a serialized StableHLO function (`jax.export`) + a params
msgpack, loadable on any JAX backend (TPU/CPU/GPU) — the TPU-world
equivalent of the ONNX path.
"""
from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence

import numpy as np

from ..utils import logger


class Predictor:
    def __init__(self, model_dir: str, name: str = "inference", transform=None):
        import jax
        from jax import export as jexport
        from flax import serialization

        hlo_path = os.path.join(model_dir, f"{name}.stablehlo")
        params_path = os.path.join(model_dir, f"{name}.params")
        with open(hlo_path, "rb") as f:
            self._exported = jexport.deserialize(bytearray(f.read()))
        with open(params_path, "rb") as f:
            self._params = serialization.msgpack_restore(f.read())
        self._call = jax.jit(self._exported.call)
        from ..data.transforms import build_transform

        self._transform = build_transform(transform) if transform is not None else None
        logger.info(f"Predictor loaded {hlo_path}")

    def preprocess(self, images: Sequence[Any]) -> np.ndarray:
        if self._transform is None:
            return np.asarray(images)
        return np.stack([np.asarray(self._transform(im)) for im in images])

    def predict(self, batch: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        return np.asarray(self._call(self._params, jnp.asarray(batch)))

    def postprocess(self, logits: np.ndarray, topk: int = 5):
        ex = np.exp(logits - logits.max(axis=-1, keepdims=True))
        probs = ex / ex.sum(axis=-1, keepdims=True)
        idx = np.argsort(-probs, axis=-1)[:, :topk]
        return [
            {"class_ids": list(map(int, idx[i])),
             "scores": [float(probs[i, j]) for j in idx[i]]}
            for i in range(len(logits))
        ]

    def __call__(self, images, topk: int = 5):
        batch = self.preprocess(images)
        return self.postprocess(self.predict(batch), topk=topk)
