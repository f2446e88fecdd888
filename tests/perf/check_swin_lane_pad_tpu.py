"""On-chip ABAB measurement of Swin lane padding (98 -> 128).

The packed win_pack=2 window sequence is 98 tokens — a poor fit for the
128-wide vector lanes / MXU edge. `lane_pad: 128` zero-pads q/k/v after
the qkv projection and masks padded keys at -100, trading +~30% score
flops for lane-aligned tiles (the trade the ViT micro experiment won at
197->256, docs/benchmarks.md Micro table). VERDICT round-5 ask #2.

Run manually on a TPU host:

    python tests/perf/check_swin_lane_pad_tpu.py

Measures the full Swin-B bs128 train step via bench._bench_classifier
(20 fetch-synced iters after warmup), ABAB-interleaved so drift shows up
as disagreement between the two runs of each variant, at both f32 and
bf16 softmax_dtype.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import bench as benchmod  # repo-root bench.py harness

BASE = 3006.0 / 8  # reference Swin-B imgs/s/chip (BASELINE.md)

VARIANTS = [
    ("f32_pad0", {"softmax_dtype": "float32", "lane_pad": 0}),
    ("f32_pad128", {"softmax_dtype": "float32", "lane_pad": 128}),
    ("bf16_pad0", {"softmax_dtype": "bfloat16", "lane_pad": 0}),
    ("bf16_pad128", {"softmax_dtype": "bfloat16", "lane_pad": 128}),
]


def main():
    results = {name: [] for name, _ in VARIANTS}
    for rep in range(2):  # ABAB: every variant measured twice, interleaved
        for name, cfg in VARIANTS:
            t = time.time()
            r = benchmod._bench_classifier(
                dict({"name": "swin_base_patch4_window7_224"}, **cfg),
                128, BASE, grad_clip_norm=5.0)
            results[name].append(r)
            print(f"[rep{rep}] {name}: {r['imgs_per_sec_per_chip']} imgs/s "
                  f"mfu {r['mfu']} vs_baseline {r['vs_baseline']} "
                  f"({time.time() - t:.0f}s)", flush=True)
    print("\n=== summary (mean of 2 interleaved reps) ===")
    for name, rs in results.items():
        ips = sum(r["imgs_per_sec_per_chip"] for r in rs) / len(rs)
        spread = max(r["imgs_per_sec_per_chip"] for r in rs) - \
            min(r["imgs_per_sec_per_chip"] for r in rs)
        mfu = sum(r["mfu"] for r in rs) / len(rs)
        print(f"{name}: {ips:.1f} imgs/s (spread {spread:.1f}) "
              f"mfu {mfu:.3f} vs_baseline {ips / BASE:.3f}")


if __name__ == "__main__":
    main()
