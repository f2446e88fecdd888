"""Extract a sub-tree of weights from a training checkpoint.

Capability parity with reference `tools_v110/extract_weight.py` (pull
the backbone out of an SSL checkpoint so linear-probe/finetune configs
can `Global.pretrained_model=` it).

Usage:
  python -m passl_tpu.tools.extract_weights \
      --checkpoint out/mocov2/latest.ckpt \
      --prefix encoder_q/backbone \
      --output out/mocov2/backbone.params \
      [--strip-prefix]            # drop the prefix from saved keys
      [--rename backbone]         # re-root the subtree under a new key
"""
from __future__ import annotations

import argparse

from flax import serialization, traverse_util

from passl_tpu.utils import io, logger


def main():
    ap = argparse.ArgumentParser("extract weights")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--prefix", required=True, help="param path prefix, e.g. encoder_q/backbone")
    ap.add_argument("--output", required=True)
    ap.add_argument("--strip-prefix", action=argparse.BooleanOptionalAction, default=True,
                    help="drop the prefix from saved keys (--no-strip-prefix keeps it)")
    ap.add_argument("--rename", default=None, help="re-root under this key")
    args = ap.parse_args()

    with open(args.checkpoint, "rb") as f:
        state = serialization.msgpack_restore(f.read())
    params = state["params"] if "params" in state else state
    prefix = args.prefix.rstrip("/") + "/"

    def pick(tree):
        flat = traverse_util.flatten_dict(tree, sep="/")
        cut = len(prefix) if args.strip_prefix else 0
        sub = {k[cut:]: v for k, v in flat.items() if k.startswith(prefix)}
        if args.rename:
            sub = {f"{args.rename}/{k}": v for k, v in sub.items()}
        return traverse_util.unflatten_dict(sub, sep="/") if sub else None

    picked = pick(params)
    if picked is None:
        flat = traverse_util.flatten_dict(params, sep="/")
        available = sorted({k.split("/")[0] for k in flat})
        raise SystemExit(f"no params under '{args.prefix}'. top-level keys: {available}")

    # BN running statistics MUST travel with the backbone: a frozen
    # backbone normalizing with fresh init stats produces garbage
    # features (SURVEY §7 hard part 2). Bundle them when present.
    bstats = None
    ms = state.get("model_state", {}) if isinstance(state, dict) else {}
    if isinstance(ms, dict) and ms.get("batch_stats"):
        bstats = pick(ms["batch_stats"])

    if bstats is not None:
        io.save_params({"params": picked, "batch_stats": bstats}, args.output)
        n_bs = len(traverse_util.flatten_dict(bstats))
        logger.info(f"extracted params + {n_bs} BN-stat tensors from "
                    f"'{args.prefix}' -> {args.output}")
    else:
        io.save_params(picked, args.output)
        logger.info(f"extracted params from '{args.prefix}' -> {args.output}")


if __name__ == "__main__":
    main()
