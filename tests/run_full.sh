#!/usr/bin/env bash
# Full test tier, sharded across fresh interpreter processes.
#
# NOTE: `python -m pytest tests/ -q` in ONE process also works now
# (294 passed / 37 min). The historical ~75% fatal abort was stale
# XLA:CPU AOT cache blobs compiled on a different host machine
# (engine._host_cpu_fingerprint fixed the cache keying) — not
# executable buildup as first thought. This sharded runner is kept for
# parallel-shard debugging and lower peak memory on small hosts.
#
# Usage: bash tests/run_full.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
rc=0
# shard 1: engine/integration-heavy; shard 2: models/methods;
# shard 3: everything else (derived, so new test files run by default)
SHARD1="tests/test_engine.py tests/test_engine_ssl.py tests/test_hooks.py tests/test_sharded_checkpoint.py tests/test_pipeline_parallel.py tests/test_parallel.py"
SHARD2="tests/test_backbones.py tests/test_clip.py tests/test_dense_methods.py tests/test_mae_mocov3.py tests/test_mim_methods.py tests/test_ssl_methods.py tests/test_token_label.py tests/test_train_step.py"
SHARD3=""
for f in tests/test_*.py; do
  case " $SHARD1 $SHARD2 " in
    *" $f "*) ;;
    *) SHARD3="$SHARD3 $f" ;;
  esac
done
for shard in "$SHARD1" "$SHARD2" "$SHARD3"; do
  # shellcheck disable=SC2086
  python -m pytest $shard -q "$@" || rc=1
done
exit $rc
