"""Evaluation CLI (reference `tools/eval.py:26-33`)."""
from __future__ import annotations

from passl_tpu.engine import Engine
from passl_tpu.utils import cfg_util


def main():
    args = cfg_util.parse_args("PASSL-TPU eval")
    config = cfg_util.get_config(args.config, overrides=args.override, show=True)
    engine = Engine(config, mode="eval")
    engine.eval()


if __name__ == "__main__":
    main()
