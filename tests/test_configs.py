"""Every shipped config must parse and its Model must build."""
import glob
import os

import pytest

from passl_tpu.models import build_model
from passl_tpu.utils import cfg_util

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "**", "*.yaml"), recursive=True))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.relpath(p, REPO) for p in CONFIGS])
def test_config_builds(path):
    cfg = cfg_util.get_config(path)
    assert "Model" in cfg and "Global" in cfg
    model = build_model(dict(cfg["Model"]))
    assert model is not None
    if "DataLoader" in cfg and "Train" in cfg["DataLoader"]:
        train = cfg["DataLoader"]["Train"]
        assert "dataset" in train and "sampler" in train
    # every transform op referenced by any block must be registered and
    # constructible (catches ops that exist but are never imported)
    from passl_tpu.data.transforms import build_transform

    for mode in ("Train", "Eval"):
        block = cfg.get("DataLoader", {}).get(mode)
        if not block:
            continue
        ds = block["dataset"]
        if ds.get("transform"):
            build_transform(ds["transform"])
        for t in ds.get("transforms") or []:  # multi-crop stacks
            build_transform(t)
