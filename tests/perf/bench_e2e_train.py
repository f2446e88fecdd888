"""End-to-end train benchmark: real JPEG decode on the host feeding the
real chip (closes the 'bench is synthetic-resident only' gap).

Builds the same on-disk JPEG set as bench_loader.py, then runs the
production SimCLR R50 uint8+on-device-aug recipe through the full
Engine (config -> loader workers -> shard_batch -> jitted train step)
and reports steady-state ips plus reader_cost/batch_cost split from
the loop meters.

NOTE on this rig: the bench host exposes ONE CPU core, so the run is
host-bound by design (docs/benchmarks.md input-pipeline table: uint8
recipe = ~249 imgs/s/core; a production TPU host has >100 cores per
4-8 chips). The number to check is that ips ~= the loader rate — i.e.
the device overlaps cleanly and the pipeline, not the framework, is
the limit.

Usage: python tests/perf/bench_e2e_train.py [--images 2000] [--steps 40]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=2000)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--workers", type=int, default=0)
    args = ap.parse_args()

    from tests.perf.bench_loader import make_jpeg_dataset

    root = "/tmp/passl_jpeg_bench"
    list_path = make_jpeg_dataset(root, args.images)

    from passl_tpu.engine import Engine
    from passl_tpu.utils.misc import create_attr_dict

    cfg = create_attr_dict({
        "Global": {"epochs": 1, "output_dir": "/tmp/passl_e2e_train",
                   "print_batch_step": 10, "save_interval": 0, "seed": 0,
                   "max_train_step": args.steps},
        "FP16": {"enable": True, "level": "O1"},
        "Model": {
            "name": "SimCLR",
            "backbone": {"name": "resnet50", "num_classes": 0, "with_pool": False},
            "neck": {"name": "NonLinearNeckfc3", "hid_channels": 2048, "out_channels": 128},
            "temperature": 0.5,
            "use_device_augment": True,
        },
        "LRScheduler": {"name": "CosineWarmup", "learning_rate": 0.3, "warmup_epochs": 1},
        "Optimizer": {"name": "MomentumLARS", "momentum": 0.9, "weight_decay": 1.0e-6,
                      "one_dim_param_no_weight_decay": True},
        "DataLoader": {"Train": {
            "dataset": {
                "name": "ImageNetDataset",
                "image_root": root,
                "cls_label_path": list_path,
                "transform": [
                    {"DecodeImage": {"backend": "cv2"}},
                    {"TwoViewsTransform": {"base_transform1": [
                        {"RandomResizedCrop": {"size": 224, "scale": [0.08, 1.0],
                                               "backend": "cv2"}},
                        {"RandFlipImage": {"prob": 0.5}},
                    ]}},
                ],
            },
            "sampler": {"batch_size": args.batch, "shuffle": True, "drop_last": True},
            "loader": {"num_workers": args.workers, "prefetch": 4},
        }},
    })
    e = Engine(cfg, mode="train")
    e.train()
    t = e.train_loop.time_info
    # window avg (last print_batch_step steps) excludes the compile step
    ips = e.global_batch_size / max(t["batch_cost"].avg, 1e-9)
    print(json.dumps({
        "e2e_ips_steady": round(ips, 1),
        "batch_cost_s": round(t["batch_cost"].avg, 4),
        "reader_cost_s": round(t["reader_cost"].avg, 4),
        "reader_fraction": round(t["reader_cost"].avg
                                 / max(t["batch_cost"].avg, 1e-9), 3),
        "steps": args.steps, "batch": args.batch,
    }))


if __name__ == "__main__":
    main()
