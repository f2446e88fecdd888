"""Golden regression CI: deterministic short runs + loss/ips checks.

The TPU-world equivalent of reference `tests/CI/case.sh` (~26 cases,
50 deterministic steps each, exact-loss + ips-budget assertions parsed
from logs). Here each case runs N steps of the real Engine on
synthetic data with pinned seeds and asserts:
  - loss@stepN matches the per-platform golden (rtol 1e-4; XLA is
    run-to-run deterministic on a fixed platform)
  - ips within -10% of the golden, CONTENTION-TOLERANT: a miss gets one
    timing retry, and still-missing only fails when the host looks
    quiet (load heuristic) — otherwise it reports "inconclusive". The
    reference's ±5% gate (case.sh:476-516) assumes a dedicated node;
    this rig's single host core is shared, and a concurrent suite was
    observed to halve measured ips with the loss bit-exact.

Usage:
  python tests/ci/run_ci.py                # check against goldens
  python tests/ci/run_ci.py --update      # regenerate goldens
  python tests/ci/run_ci.py --case mocov2_r18  # single case
Goldens are stored per JAX platform in golden_<platform>.json.
"""
from __future__ import annotations

import argparse
import json
import os

import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")

CASES = {
    "simclr_r18": {
        "config": "configs/simclr/simclr_r18_synthetic.yaml",
        "overrides": ["Global.max_train_step=8", "Global.print_batch_step=100",
                      "Global.save_interval=0", "Global.epochs=2"],
    },
    "mocov2_r18": {
        "config": "configs/moco/mocov2_r18_synthetic.yaml",
        "overrides": ["Global.max_train_step=8", "Global.print_batch_step=100",
                      "Global.save_interval=0", "Global.epochs=2"],
    },
    "mae_tiny": {
        "config": "configs/mae/mae_vit_tiny_synthetic.yaml",
        "overrides": ["Global.max_train_step=8", "Global.print_batch_step=100",
                      "Global.save_interval=0", "Global.epochs=2"],
    },
    "vit_tiny_cls": {
        "config": "configs/classification/vit_tiny_synthetic.yaml",
        "overrides": ["Global.max_train_step=8", "Global.print_batch_step=100",
                      "Global.save_interval=0", "Global.epochs=2",
                      "Global.eval_during_train=False"],
    },
    "byol_r18": {
        "config": "configs/byol/byol_r18_synthetic.yaml",
        "overrides": ["Global.max_train_step=8", "Global.print_batch_step=100",
                      "Global.save_interval=0", "Global.epochs=2"],
    },
    "swav_r18": {
        "config": "configs/swav/swav_r18_synthetic.yaml",
        "overrides": ["Global.max_train_step=8", "Global.print_batch_step=100",
                      "Global.save_interval=0", "Global.epochs=2"],
    },
    "convmae_tiny": {
        "config": "configs/convmae/convmae_tiny_synthetic.yaml",
        "overrides": ["Global.max_train_step=8", "Global.print_batch_step=100",
                      "Global.save_interval=0", "Global.epochs=2"],
    },
    "mocov3_tiny": {
        "config": "configs/mocov3/mocov3_tiny_synthetic.yaml",
        "overrides": ["Global.max_train_step=8", "Global.print_batch_step=100",
                      "Global.save_interval=0", "Global.epochs=2"],
    },
    "cae_tiny": {
        "config": "configs/cae/cae_tiny_synthetic.yaml",
        "overrides": ["Global.max_train_step=8", "Global.print_batch_step=100",
                      "Global.save_interval=0", "Global.epochs=2"],
    },
    "clip_tiny": {
        "config": "configs/clip/clip_tiny_synthetic.yaml",
        "overrides": ["Global.max_train_step=8", "Global.print_batch_step=100",
                      "Global.save_interval=0", "Global.epochs=2"],
    },
}

# classification zoo + SSL ft/lp twins (reference case.sh families:
# ViT/DeiT/CaiT/Swin/ConvNeXt cls; MAE/ConvMAE/CAE/MoCoV3/SimSiam
# pretrain+finetune+linearprobe; DINO/DINOv2 lp; BEiT ft) — each tiny
# config names its production recipe in its header comment.
_STD = ["Global.max_train_step=8", "Global.print_batch_step=100",
        "Global.save_interval=0", "Global.epochs=2",
        "Global.eval_during_train=False"]
for _name, _cfg in {
    "deit_tiny_cls": "configs/classification/deit_tiny_synthetic.yaml",
    "cait_tiny_cls": "configs/classification/cait_tiny_synthetic.yaml",
    "swin_tiny_cls": "configs/classification/swin_tiny_synthetic.yaml",
    "convnext_tiny_cls": "configs/classification/convnext_tiny_synthetic.yaml",
    "vit_tiny_ft48": "configs/classification/vit_tiny_ft48_synthetic.yaml",
    "mae_tiny_ft": "configs/mae/mae_tiny_ft_synthetic.yaml",
    "mae_tiny_lp": "configs/mae/mae_tiny_lp_synthetic.yaml",
    "convmae_tiny_ft": "configs/convmae/convmae_tiny_ft_synthetic.yaml",
    "cae_tiny_ft": "configs/cae/cae_tiny_ft_synthetic.yaml",
    "beit_tiny_ft": "configs/beit/beit_tiny_ft_synthetic.yaml",
    "mocov3_tiny_lp": "configs/mocov3/mocov3_tiny_lp_synthetic.yaml",
    "dino_tiny_lp": "configs/dino/dino_tiny_lp_synthetic.yaml",
    "dinov2_tiny_lp": "configs/dinov2/dinov2_tiny_lp_synthetic.yaml",
    "simsiam_r18": "configs/simsiam/simsiam_r18_synthetic.yaml",
    "lvvit_tiny_tl": "configs/lvvit/lvvit_tiny_token_label_synthetic.yaml",
    # round-3 family coverage (reference configs/xcit, cvt, t2t_vit,
    # mlp_mixer, moco_byol, densecl, pixpro, moco-v1 + RegNet teacher)
    "xcit_tiny_cls": "configs/xcit/xcit_tiny_synthetic.yaml",
    "cvt_tiny_cls": "configs/cvt/cvt_tiny_synthetic.yaml",
    "t2t_tiny_cls": "configs/t2t_vit/t2t_tiny_synthetic.yaml",
    "mixer_tiny_cls": "configs/mlp_mixer/mixer_tiny_synthetic.yaml",
    "regnet_tiny_cls": "configs/classification/regnet_tiny_synthetic.yaml",
    "moco_byol_r18": "configs/moco_byol/moco_byol_r18_synthetic.yaml",
    "densecl_r18": "configs/densecl/densecl_r18_synthetic.yaml",
    "fastmoco_r18": "configs/moco/fastmoco_r18_synthetic.yaml",
    "mocov1_r18": "configs/moco/mocov1_r18_synthetic.yaml",
    "pixpro_r18": "configs/pixpro/pixpro_r18_synthetic.yaml",
}.items():
    CASES[_name] = {"config": _cfg, "overrides": list(_STD)}

# precision-variant cases (reference runs DeiT fp32+fp16o2 and Swin
# O1+O2 as separate CI rows, case.sh:93-145) — same configs under the
# bf16 O2 policy
_AMP = ["FP16.enable=True", "FP16.level=O2", "FP16.dtype=bfloat16"]
CASES["deit_tiny_cls_bf16"] = {
    "config": "configs/classification/deit_tiny_synthetic.yaml",
    "overrides": list(_STD) + list(_AMP)}
CASES["swin_tiny_cls_bf16"] = {
    "config": "configs/classification/swin_tiny_synthetic.yaml",
    "overrides": list(_STD) + list(_AMP)}
CASES["distill_tiny"] = {
    "config": "configs/distill/distill_tiny_synthetic.yaml",
    "overrides": list(_STD)}
# round-4: V-MoE (routed experts + load-balance aux loss; beyond the
# reference — production recipe configs/classification/
# vmoe_base_patch16_224_e8_in1k.yaml)
CASES["vmoe_tiny_cls"] = {
    "config": "configs/classification/vmoe_tiny_synthetic.yaml",
    "overrides": list(_STD)}


def _global_batch(spec: dict) -> int:
    import yaml

    with open(os.path.join(REPO, spec["config"])) as f:
        cfg = yaml.safe_load(f)
    return int(cfg["DataLoader"]["Train"]["sampler"].get("batch_size", 128))


def run_case(name: str, spec: dict) -> dict:
    from passl_tpu.engine import Engine
    from passl_tpu.utils import cfg_util

    # determinism is framework-owned: Engine seeds the ambient RNGs and
    # the loader keys aug per sample (loader._sample_key) — the harness
    # deliberately does NOT seed anything, so these goldens certify the
    # real CLI behavior (a regression here = a reproducibility bug)
    config = cfg_util.get_config(os.path.join(REPO, spec["config"]),
                                 overrides=spec["overrides"])
    config["Global"]["output_dir"] = f"/tmp/passl_ci/{name}"
    t0 = time.perf_counter()
    e = Engine(config, mode="train")
    e.train()
    wall = time.perf_counter() - t0
    m = e.train_loop.last_metrics
    loss = float(m["loss"])
    steps = int(e.state.step)
    # post-compile ips estimate from the loop's timing meter
    bc = e.train_loop.time_info["batch_cost"]
    ips = e.global_batch_size / max(bc.median, 1e-9)
    return {"loss": round(loss, 5), "steps": steps, "ips": round(ips, 1),
            "wall_s": round(wall, 1)}


def _host_load1() -> float:
    try:
        return os.getloadavg()[0]
    except OSError:  # platform without getloadavg
        return 0.0


def _host_contended(load1: float | None = None) -> tuple[bool, float]:
    """Heuristic: is something ELSE eating this host's CPU?

    Our own just-finished case drives the 1-min load toward ~1 process;
    a concurrent suite (the observed failure mode: a pytest run held
    the single host core and halved measured ips, 402 vs golden 822 —
    loss stayed bit-exact) pushes it well past ncpu. Threshold
    0.6*ncpu + 1.0 keeps "just us" below and "us + a contender" above
    on a 1-core rig; it is a heuristic, so it gates only the REPORTING
    (fail vs inconclusive), never the loss check.
    """
    if load1 is None:
        load1 = _host_load1()
    ncpu = os.cpu_count() or 1
    return load1 > 0.6 * ncpu + 1.0, load1


def ips_verdict(name: str, golden_ips: float, budget: float,
                first_ips: float, retry_ips: float | None,
                contended: bool, load1: float) -> tuple[str, str]:
    """Pure decision logic for the real-device ips gate (unit-tested).

    Returns (verdict, message) where verdict is one of
    'pass' | 'inconclusive' | 'fail'. A measurement below budget only
    FAILS if a retry also misses AND the host looks quiet — rig
    contention is not a regression (reference case.sh's ±5% gate
    assumes a dedicated node; this rig does not have one).
    """
    floor = golden_ips * budget
    if first_ips >= floor:
        return "pass", ""
    if retry_ips is not None and retry_ips >= floor:
        return "pass", (f"{name}: ips {first_ips} recovered to {retry_ips} "
                        f"on retry (transient; golden {golden_ips})")
    shown = first_ips if retry_ips is None else f"{first_ips} then {retry_ips} on retry"
    if contended:
        return "inconclusive", (
            f"{name}: ips {shown} < {budget:.0%} of golden {golden_ips} but "
            f"host is contended (load1={load1:.1f}) — inconclusive, "
            f"re-run on a quiet host")
    return "fail", (f"{name}: ips {shown} < {budget:.0%} of golden "
                    f"{golden_ips} (host quiet, load1={load1:.1f})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true")
    ap.add_argument("--case", default=None)
    ap.add_argument("--ips-budget", type=float, default=0.9,
                    help="min fraction of golden ips (reference case.sh "
                         "enforces ±5%%; 0.9 leaves headroom for the "
                         "tunneled platform's timing jitter)")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="force platform (cpu = 8-device virtual mesh); "
                         "default: whatever jax picks")
    args = ap.parse_args()

    if args.platform == "cpu":
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8").strip()
    import jax

    if args.platform == "cpu":
        # env var alone is overridden by the axon sitecustomize
        jax.config.update("jax_platforms", "cpu")

    platform = jax.devices()[0].platform
    golden_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               f"golden_{platform}.json")
    goldens = {}
    if os.path.exists(golden_path):
        with open(golden_path) as f:
            goldens = json.load(f)

    cases = {args.case: CASES[args.case]} if args.case else CASES
    results, failures, ips_suspects = {}, [], []
    for name, spec in cases.items():
        print(f"[CI] running {name} ...", flush=True)
        r = run_case(name, spec)
        results[name] = r
        print(f"[CI] {name}: {r}", flush=True)
        if args.update or name not in goldens:
            continue
        g = goldens[name]
        if not np.isclose(r["loss"], g["loss"], rtol=1e-4, atol=1e-5):
            failures.append(f"{name}: loss {r['loss']} != golden {g['loss']}")
        # ips gate only on the real device AND for compute-bound cases:
        # CPU-platform throughput on a shared 1-core rig measures host
        # load, not regressions (a loss-exact run can false-fail); and
        # when the golden implies < 50 ms/step the measurement is
        # tunnel-dispatch jitter, not device throughput
        implied_ms = 1000.0 * _global_batch(spec) / max(g["ips"], 1e-9)
        if platform != "cpu" and implied_ms >= 50.0 \
                and r["ips"] < g["ips"] * args.ips_budget:
            ips_suspects.append((name, spec, g, r))

    # Contention-tolerant ips pass: a below-budget rate gets ONE timing
    # retry (compile cache makes it cheap; loss determinism was already
    # checked above) and only fails if the retry also misses on a quiet
    # host. Observed live (round-4 review): a concurrent pytest run
    # false-failed mocov2_r18 at 402 vs golden 822 ips; the clean rerun
    # hit 1024.8 with the loss bit-exact both times.
    inconclusive = []
    for name, spec, g, r in ips_suspects:
        contended, load1 = _host_contended()
        print(f"[CI] {name}: ips {r['ips']} below budget "
              f"(load1={load1:.1f}{', contended' if contended else ''}); "
              "re-measuring once ...", flush=True)
        try:
            r2 = run_case(name, spec)
        except Exception as e:  # noqa: BLE001 — retry must not mask the signal
            r2 = None
            print(f"[CI] {name}: ips retry errored ({e}); judging first run only")
        contended, load1 = _host_contended()
        verdict, msg = ips_verdict(name, g["ips"], args.ips_budget, r["ips"],
                                   r2["ips"] if r2 else None, contended, load1)
        if verdict == "fail":
            failures.append(msg)
        elif verdict == "inconclusive":
            inconclusive.append(msg)
        if msg:
            print(f"[CI] {msg}", flush=True)

    if args.update:
        goldens.update(results)
        with open(golden_path, "w") as f:
            json.dump(goldens, f, indent=2, sort_keys=True)
        print(f"[CI] goldens written to {golden_path}")
        return 0
    missing = [n for n in cases if n not in goldens]
    if missing:
        print(f"[CI] WARNING: no goldens for {missing} on platform {platform} "
              f"(run with --update)")
    if inconclusive:
        print("[CI] INCONCLUSIVE (not failures):\n  " + "\n  ".join(inconclusive))
    if failures:
        print("[CI] FAILURES:\n  " + "\n  ".join(failures))
        return 1
    print(f"[CI] all {len(cases)} cases passed on {platform}"
          + (f" ({len(inconclusive)} ips checks inconclusive)" if inconclusive else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
