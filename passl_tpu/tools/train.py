"""Training CLI.

Capability parity with reference `tools/train.py:26-36`:
`passl-train -c config.yaml -o Global.epochs=10 [-p profiler_opts]`.
No per-device launcher needed: one process drives all local TPU chips
(SPMD); multi-host runs start the same command on every host.
"""
from __future__ import annotations

from passl_tpu.engine import Engine
from passl_tpu.utils import cfg_util


def main():
    args = cfg_util.parse_args("PASSL-TPU train")
    config = cfg_util.get_config(args.config, overrides=args.override, show=True)
    if args.profiler_options:
        config.setdefault("Global", {})["profiler_options"] = args.profiler_options
    engine = Engine(config, mode="train")
    engine.train()


if __name__ == "__main__":
    main()
