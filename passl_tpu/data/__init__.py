"""Data pipeline factory.

Capability parity with reference `passl/data/__init__.py:25-83`
(`build_dataloader(config, mode, ...)` → dataset + batch sampler +
DataLoader with per-loader collate and batch transforms).
"""
from __future__ import annotations

import copy
from typing import Any, Dict, Optional

from . import autoaugment  # noqa: F401  (registers AutoAugment/RandAugment/AugMix/TimmAutoAugment)
from . import batch_transforms as _bt
from . import masking  # noqa: F401  (registers mask transforms)
from .datasets import DATASETS
from .loader import DataLoader, DistributedBatchSampler, RepeatedAugSampler

SAMPLERS = {
    "DistributedBatchSampler": DistributedBatchSampler,
    "BatchSampler": DistributedBatchSampler,
    "RepeatedAugSampler": RepeatedAugSampler,
    "DistributedRepeatedAugSampler": RepeatedAugSampler,
}


def build_dataset(cfg: Dict[str, Any]):
    cfg = copy.deepcopy(dict(cfg))
    name = cfg.pop("name")
    if name not in DATASETS and ("TokenLabel" in name or name.startswith("LVViT")):
        from .datasets import _register_token_label

        _register_token_label()
    if name == "SwAVMultiCropDataset" and isinstance(cfg.get("dataset"), dict):
        cfg["dataset"] = build_dataset(cfg["dataset"])
    return DATASETS[name](**cfg)


def build_dataloader(config: Dict[str, Any], mode: str = "Train", seed: int = 0) -> DataLoader:
    """config: the DataLoader.<mode> block:
      dataset: {name: ..., transform: [...], ...}
      sampler: {name: DistributedBatchSampler, batch_size, shuffle, drop_last}
      loader:  {num_workers, prefetch}
      batch_transform: [{Mixup: {...}}, ...]   (reference batch_transforms)
    `sampler.batch_size` is the GLOBAL batch size; this process loads
    its per-host share (global/process_count).
    """
    import jax

    cfg = copy.deepcopy(dict(config))
    dataset = build_dataset(cfg["dataset"])
    sampler_cfg = dict(cfg.get("sampler", {}))
    sampler_name = sampler_cfg.pop("name", "DistributedBatchSampler")
    global_bs = int(sampler_cfg.pop("batch_size", 128))
    nproc = jax.process_count()
    assert global_bs % nproc == 0, f"global batch {global_bs} % hosts {nproc}"
    sampler = SAMPLERS[sampler_name](
        dataset_len=len(dataset),
        batch_size=global_bs // nproc,
        shuffle=sampler_cfg.pop("shuffle", mode.lower() == "train"),
        drop_last=sampler_cfg.pop("drop_last", mode.lower() == "train"),
        seed=seed,
        num_replicas=nproc,
        rank=jax.process_index(),
        **sampler_cfg,
    )
    loader_cfg = dict(cfg.get("loader", {}))
    batch_transform = None
    if cfg.get("batch_transform"):
        batch_transform = _bt.build_batch_transform(cfg["batch_transform"])
    return DataLoader(
        dataset,
        sampler,
        num_workers=int(loader_cfg.get("num_workers", 0)),
        prefetch=int(loader_cfg.get("prefetch", 2)),
        batch_transform=batch_transform,
        seed=seed,
    )
