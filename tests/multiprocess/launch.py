"""Real multi-process distributed training check (2 OS processes).

The only SURVEY axis single-process SPMD cannot cover: per-process
batch partitioning (`data/__init__.py` sampler rank split), gloo/ICI
collectives across process boundaries, orbax multi-host checkpoint
coordination, and cross-process resume. The reference exercises this by
launching its trainer under a rank-env launcher
(`tests/test_tipc/benchmark_common/run_benchmark.sh:83-87`,
`PADDLE_TRAINER_ID`); here the same `passl_tpu.tools.train` CLI runs
under `jax.distributed.initialize` (localhost coordinator, env-var path
in `engine/engine.py _maybe_init_multihost`).

Phases (each an independent process group):
  1. baseline: 1 process x 8 virtual CPU devices, 2 epochs
  2. mp2:      2 processes x 4 devices, same config -> final loss must
               match baseline (sampler interleaving permutes the global
               batch; mean losses are permutation-invariant) and an
               orbax checkpoint directory must exist
  3. mp2 resume: 2-process run stopped after epoch 1, then a fresh
               2-process group resumes from the orbax checkpoint and
               finishes epoch 2 -> final loss must match phase 2

Usage: python tests/multiprocess/launch.py  (prints JSON verdict)
"""
from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
CFG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mp_tiny.yaml")
# Unique-per-invocation port block and work dir: the same script is
# reachable from both pytest (tests/test_multiprocess.py) and
# __graft_entry__.dryrun_multichip; a fixed port/path would cross-talk
# if two invocations ever overlap on one host (coordinator bind clash,
# rmtree of a live run's checkpoints). Overridable for debugging.
BASE_PORT = int(os.environ.get("PASSL_MP_BASE_PORT", "0")) or \
    12650 + (os.getpid() % 1889)
WORK = os.environ.get("PASSL_MP_DIR") or f"/tmp/passl_mp.{os.getpid()}"


def _env(nprocs: int, pid: int, ndev: int, port: int) -> dict:
    env = dict(os.environ)
    env["PASSL_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if nprocs > 1:
        env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
        env["JAX_NUM_PROCESSES"] = str(nprocs)
        env["JAX_PROCESS_ID"] = str(pid)
    else:
        for k in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
            env.pop(k, None)
    # each process group must not share compiled-executable caches keyed
    # on topology in surprising ways; isolate to be safe
    # compile cache: keyed by topology (ndev) but SHARED across
    # invocations — jax's cache is content-addressed (temp-write +
    # rename), so concurrent groups are safe, and a warm cache keeps
    # the whole check well inside the dryrun timeout
    env["JAX_COMPILATION_CACHE_DIR"] = f"/tmp/passl_mp_jaxcache_{ndev}"
    return env


def run_group(tag: str, nprocs: int, ndev: int, port: int, overrides: list) -> dict:
    """Launch `nprocs` trainer processes; return parsed rank-0 results."""
    outdir = f"{WORK}/{tag}"
    shutil.rmtree(outdir, ignore_errors=True)
    cmd_base = [sys.executable, "-m", "passl_tpu.tools.train", "-c", CFG,
                "-o", f"Global.output_dir={outdir}"]
    for o in overrides:
        cmd_base += ["-o", o]
    procs, logs = [], []
    for pid in range(nprocs):
        log = open(f"{WORK}/{tag}.p{pid}.log", "w")
        logs.append(log.name)
        procs.append(subprocess.Popen(
            cmd_base, cwd=REPO, env=_env(nprocs, pid, ndev, port),
            stdout=log, stderr=subprocess.STDOUT))
    rcs = [p.wait(timeout=600) for p in procs]
    if any(rcs):
        for ln in logs:
            sys.stderr.write(f"----- {ln} (tail) -----\n")
            sys.stderr.write("".join(open(ln).readlines()[-30:]))
        raise RuntimeError(f"{tag}: exit codes {rcs}")
    text = open(logs[0]).read()
    losses = [float(m) for m in re.findall(r" loss: ([0-9.]+)", text)]
    resumed = bool(re.search(r"resumed .*(step \d+)", text))
    ckpt_dir = os.path.join(outdir, "latest.orbax")
    return {"tag": tag, "losses": losses, "final_loss": losses[-1] if losses else None,
            "n_log_lines": len(losses), "orbax_ckpt": os.path.isdir(ckpt_dir),
            "resumed": resumed, "rank0_log": logs[0]}


def run_eval_group(tag: str, nprocs: int, ndev: int, port: int, ckpt: str) -> dict:
    """Launch `nprocs` eval processes on a shared checkpoint; parse the
    [Eval] metric line (device-side global top-k with ragged-tail trim)."""
    outdir = f"{WORK}/{tag}"
    shutil.rmtree(outdir, ignore_errors=True)
    cmd = [sys.executable, "-m", "passl_tpu.tools.eval", "-c", CFG,
           "-o", f"Global.output_dir={outdir}", "-o", f"Global.checkpoint={ckpt}"]
    procs, logs = [], []
    for pid in range(nprocs):
        log = open(f"{WORK}/{tag}.p{pid}.log", "w")
        logs.append(log.name)
        procs.append(subprocess.Popen(
            cmd, cwd=REPO, env=_env(nprocs, pid, ndev, port),
            stdout=log, stderr=subprocess.STDOUT))
    rcs = [p.wait(timeout=600) for p in procs]
    if any(rcs):
        for ln in logs:
            sys.stderr.write(f"----- {ln} (tail) -----\n")
            sys.stderr.write("".join(open(ln).readlines()[-30:]))
        raise RuntimeError(f"{tag}: exit codes {rcs}")
    text = open(logs[0]).read()
    m = re.search(r"\[Eval\].*top1: ([0-9.]+)", text)
    return {"tag": tag, "top1": float(m.group(1)) if m else None}


def run_mesh_check(tag: str, nprocs: int, ndev: int, port: int) -> dict:
    """DCN-aware mesh locality on the live gloo topology (cheap: no
    training, one collective)."""
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "mesh_check.py")
    procs, logs = [], []
    for pid in range(nprocs):
        log = open(f"{WORK}/{tag}.p{pid}.log", "w")
        logs.append(log.name)
        procs.append(subprocess.Popen(
            [sys.executable, "-u", script], cwd=REPO,
            env=_env(nprocs, pid, ndev, port),
            stdout=log, stderr=subprocess.STDOUT))
    rcs = [p.wait(timeout=300) for p in procs]
    if any(rcs):
        for ln in logs:
            sys.stderr.write(f"----- {ln} (tail) -----\n")
            sys.stderr.write("".join(open(ln).readlines()[-30:]))
        raise RuntimeError(f"{tag}: exit codes {rcs}")
    verdict = json.loads(
        [l for l in open(logs[0]) if l.startswith("{")][-1])
    return verdict


def main() -> int:
    os.makedirs(WORK, exist_ok=True)
    results = {}

    results["mesh_locality_2p4d"] = run_mesh_check("meshchk", 2, 4, BASE_PORT + 6)
    results["baseline_1p8d"] = run_group("base", 1, 8, BASE_PORT, [])
    results["mp_2p4d"] = run_group("mp2", 2, 4, BASE_PORT + 1, [])
    # interrupted + resumed 2-process run (orbax save at epoch 1, fresh
    # process group restores and finishes epoch 2)
    results["mp_2p4d_ep1"] = run_group("mp2_ep1", 2, 4, BASE_PORT + 2,
                                       ["Global.epochs=1"])
    results["mp_2p4d_resume"] = run_group(
        "mp2_res", 2, 4, BASE_PORT + 3,
        [f"Global.checkpoint={WORK}/mp2_ep1/latest"])

    # distributed eval on the 2-process-trained checkpoint: the global
    # device-side top-k (with ragged-tail trim: 96 samples over 40-batch)
    # must agree across process topologies
    ckpt = f"{WORK}/mp2/latest"
    results["eval_1p8d"] = run_eval_group("ev1", 1, 8, BASE_PORT + 4, ckpt)
    results["eval_2p4d"] = run_eval_group("ev2", 2, 4, BASE_PORT + 5, ckpt)

    base = results["baseline_1p8d"]["final_loss"]
    mp2 = results["mp_2p4d"]["final_loss"]
    res = results["mp_2p4d_resume"]["final_loss"]
    ev1, ev2 = results["eval_1p8d"]["top1"], results["eval_2p4d"]["top1"]
    checks = {
        "mesh_locality": results["mesh_locality_2p4d"]["ok"],
        "mp2_matches_baseline": abs(mp2 - base) <= 1e-4 * max(abs(base), 1.0),
        "mp2_wrote_orbax": results["mp_2p4d"]["orbax_ckpt"],
        "resume_restored": results["mp_2p4d_resume"]["resumed"],
        "resume_matches_mp2": abs(res - mp2) <= 1e-4 * max(abs(mp2), 1.0),
        "eval_2p_matches_1p": ev1 is not None and ev2 is not None
                              and abs(ev1 - ev2) <= 1e-6,
    }
    verdict = {"ok": all(checks.values()), "checks": checks,
               "final_losses": {"baseline_1p8d": base, "mp_2p4d": mp2,
                                "mp_2p4d_resume": res},
               "eval_top1": {"1p8d": ev1, "2p4d": ev2}}
    print(json.dumps(verdict, indent=2))
    if not verdict["ok"]:
        for r in results.values():
            print(f"--- {r['tag']}: {r.get('losses', r.get('top1'))}", file=sys.stderr)
    return 0 if verdict["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
