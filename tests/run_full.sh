#!/usr/bin/env bash
# Full test tier, sharded across fresh interpreter processes.
#
# Running all ~190 tests in ONE pytest process accumulates hundreds of
# XLA CPU executables and eventually aborts with a fatal runtime error
# (observed at ~75% on an 8 GB host). Sharding by file keeps each
# process bounded; shards run sequentially so the (single) TPU or CPU
# mesh is never contended.
#
# Usage: bash tests/run_full.sh [extra pytest args]
set -u
cd "$(dirname "$0")/.."
rc=0
# shard 1: engine/integration-heavy; shard 2: models/methods; shard 3: rest
SHARDS=(
  "tests/test_engine.py tests/test_engine_ssl.py tests/test_hooks.py tests/test_sharded_checkpoint.py tests/test_pipeline_parallel.py tests/test_parallel.py"
  "tests/test_backbones.py tests/test_clip.py tests/test_dense_methods.py tests/test_mae_mocov3.py tests/test_mim_methods.py tests/test_ssl_methods.py tests/test_token_label.py tests/test_train_step.py"
  "tests/test_attention_impl.py tests/test_norm.py tests/test_configs.py tests/test_data_pipeline.py tests/test_native_decode.py tests/test_pallas_augment.py tests/test_tome.py tests/test_torch_parity.py tests/test_units.py"
)
for shard in "${SHARDS[@]}"; do
  # shellcheck disable=SC2086
  python -m pytest $shard -q "$@" || rc=1
done
exit $rc
