"""Input-pipeline benchmark: real JPEG decode + aug throughput vs the
device step rate (SURVEY §7 hard part 6: the loader must never stall
the chip; flagship R50 step rate is ~1284 imgs/s/chip).

Builds a disk dataset of real JPEGs once, then measures the DataLoader
(per-sample pipelined worker pool) under three recipes:
  full-pil   : SimCLR two-view PIL pipeline, float32 out (host does all aug)
  full-cv2   : same ops on the cv2 backend
  uint8-rrc  : decode + RRC + flip only, uint8 out — the on-device-aug
               recipe (jitter/gray/blur/normalize run fused on TPU)

Usage: python tests/perf/bench_loader.py [--images 2000] [--workers N ...]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def make_jpeg_dataset(root: str, n: int, size: int = 400) -> str:
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    list_path = os.path.join(root, "train_list.txt")
    if os.path.exists(list_path) and len(open(list_path).readlines()) >= n:
        return list_path
    lines = []
    for i in range(n):
        fn = f"img_{i:05d}.jpg"
        p = os.path.join(root, fn)
        if not os.path.exists(p):
            rs = np.random.RandomState(i)
            # low-frequency content so JPEGs are realistically sized
            base = rs.rand(size // 8, size // 8, 3)
            arr = np.kron(base, np.ones((8, 8, 1)))
            arr = (255 * (0.5 * arr + 0.5 * rs.rand(size, size, 3) * 0.2)).astype(np.uint8)
            Image.fromarray(arr).save(p, quality=87)
        lines.append(f"{fn} {i % 10}\n")
    with open(list_path, "w") as f:
        f.writelines(lines)
    return list_path


RECIPES = {
    "full-pil": [
        {"TwoViewsTransform": {"base_transform1": [
            {"RandomResizedCrop": {"size": 224, "scale": [0.2, 1.0]}},
            {"ColorJitter": {"brightness": 0.4, "contrast": 0.4, "saturation": 0.4,
                             "hue": 0.1, "prob": 0.8}},
            {"RandomGrayscale": {"prob": 0.2}},
            {"SimCLRGaussianBlur": {"sigma": [0.1, 2.0], "p": 0.5}},
            {"RandFlipImage": {"prob": 0.5}},
            {"NormalizeImage": {"scale": 0.00392157}},
        ]}},
    ],
    "full-cv2": [
        {"DecodeImage": {"backend": "cv2"}},
        {"TwoViewsTransform": {"base_transform1": [
            {"RandomResizedCrop": {"size": 224, "scale": [0.2, 1.0], "backend": "cv2"}},
            {"ColorJitter": {"brightness": 0.4, "contrast": 0.4, "saturation": 0.4,
                             "hue": 0.1, "prob": 0.8}},
            {"RandomGrayscale": {"prob": 0.2}},
            {"SimCLRGaussianBlur": {"sigma": [0.1, 2.0], "p": 0.5}},
            {"RandFlipImage": {"prob": 0.5}},
            {"NormalizeImage": {"scale": 0.00392157}},
        ]}},
    ],
    "uint8-rrc": [
        {"DecodeImage": {"backend": "cv2"}},
        {"TwoViewsTransform": {"base_transform1": [
            {"RandomResizedCrop": {"size": 224, "scale": [0.2, 1.0], "backend": "cv2"}},
            {"RandFlipImage": {"prob": 0.5}},
        ]}},
    ],
    # C++ path: raw JPEG bytes -> libjpeg DCT-scaled decode + crop +
    # resize + flip, all in native code (passl_tpu/native/decode.cc)
    "native": [
        {"TwoViewsTransform": {"base_transform1": [
            {"NativeJpegRRC": {"size": 224, "scale": [0.2, 1.0]}},
        ]}},
    ],
}
RAW_BYTES_RECIPES = {"native"}


def bench(list_path: str, root: str, recipe, workers: int, batch: int = 64,
          warm_batches: int = 2, timed_batches: int = 8,
          raw_bytes: bool = False) -> float:
    from passl_tpu.data import build_dataloader

    dl = build_dataloader({
        "dataset": {"name": "ImageNetDataset", "image_root": root,
                    "cls_label_path": list_path, "transform": recipe,
                    "raw_bytes": raw_bytes},
        "sampler": {"batch_size": batch, "shuffle": True, "drop_last": True},
        "loader": {"num_workers": workers, "prefetch": 4},
    }, "Train", seed=0)
    it = iter(dl)
    for _ in range(warm_batches):
        next(it)
    t0 = time.perf_counter()
    for _ in range(timed_batches):
        next(it)
    dt = time.perf_counter() - t0
    dl.close()
    return batch * timed_batches / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=1500)
    ap.add_argument("--workers", type=int, nargs="+",
                    default=[0, max(2, (os.cpu_count() or 1)),
                             max(4, 2 * (os.cpu_count() or 1))])
    ap.add_argument("--root", default="/tmp/passl_jpeg")
    args = ap.parse_args()

    list_path = make_jpeg_dataset(args.root, args.images)
    ncpu = os.cpu_count()
    print(f"host cpus: {ncpu}; dataset: {args.images} JPEGs @ {args.root}")
    print(f"{'recipe':<10} " + " ".join(f"w={w:<3}" for w in args.workers)
          + "   (imgs/s; two views count as one img)")
    for name, recipe in RECIPES.items():
        if name in RAW_BYTES_RECIPES:
            from passl_tpu import native

            if not native.available():
                print(f"{name:<10} (native toolchain unavailable — skipped)")
                continue
        rates = [bench(list_path, args.root, recipe, w,
                       raw_bytes=name in RAW_BYTES_RECIPES)
                 for w in args.workers]
        print(f"{name:<10} " + " ".join(f"{r:7.0f}" for r in rates))


if __name__ == "__main__":
    main()
