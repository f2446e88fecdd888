"""Export CLI (reference `tools/export.py` → engine.export())."""
from __future__ import annotations

from passl_tpu.engine import Engine
from passl_tpu.utils import cfg_util


def main():
    args = cfg_util.parse_args("PASSL-TPU export")
    config = cfg_util.get_config(args.config, overrides=args.override, show=True)
    engine = Engine(config, mode="export")
    engine.export()


if __name__ == "__main__":
    main()
