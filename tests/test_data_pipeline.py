"""Host data-pipeline tests: samplers, collate, transforms, loader."""
import numpy as np
import pytest
from PIL import Image

from passl_tpu.data.batch_transforms import Cutmix, Mixup
from passl_tpu.data.loader import DataLoader, DistributedBatchSampler, RepeatedAugSampler, default_collate
from passl_tpu.data.transforms import (CenterCrop, Compose, NormalizeImage,
                                       RandomResizedCrop, Resize, TwoViewsTransform,
                                       build_transform)


def _img(size=64, seed=0):
    return Image.fromarray(np.random.RandomState(seed).randint(0, 256, (size, size, 3), np.uint8))


def test_sampler_determinism_and_epochs():
    s = DistributedBatchSampler(dataset_len=100, batch_size=10, shuffle=True, seed=5)
    s.set_epoch(1)
    a = [b.tolist() for b in s]
    s.set_epoch(1)
    b = [x.tolist() for x in s]
    assert a == b  # same epoch → same order
    s.set_epoch(2)
    c = [x.tolist() for x in s]
    assert a != c  # different epoch → reshuffled
    assert len(a) == 10 and all(len(x) == 10 for x in a)
    # all indices covered exactly once
    flat = sorted(i for batch in a for i in batch)
    assert flat == list(range(100))


def test_sampler_multihost_partition():
    parts = []
    for rank in range(4):
        s = DistributedBatchSampler(dataset_len=100, batch_size=5, shuffle=False,
                                    num_replicas=4, rank=rank)
        parts.append([i for b in s for i in b.tolist()])
    assert all(len(p) == 25 for p in parts)
    assert sorted(sum(parts, [])) == list(range(100))  # disjoint cover


def test_repeated_aug_sampler():
    s = RepeatedAugSampler(dataset_len=30, batch_size=10, shuffle=False, num_repeats=3)
    idx = [i for b in s for i in b.tolist()]
    # every selected index appears num_repeats times in the stream
    from collections import Counter

    counts = Counter(idx)
    assert set(counts.values()) == {3}


def test_default_collate_shapes():
    samples = [(np.zeros((4, 4, 3), np.float32), 1) for _ in range(3)]
    imgs, labels = default_collate(samples)
    assert imgs.shape == (3, 4, 4, 3) and labels.shape == (3,)
    # dict samples
    d = default_collate([{"a": np.ones(2), "b": 1.5}] * 2)
    assert d["a"].shape == (2, 2) and d["b"].dtype == np.float32
    # multi-crop lists
    crops = default_collate([[np.zeros((4, 4, 3))] * 2] * 3)
    assert isinstance(crops, list) and crops[0].shape == (3, 4, 4, 3)


def test_transforms_shapes_and_normalize():
    t = build_transform([
        {"Resize": {"size": 48}},
        {"CenterCrop": {"size": 32}},
        {"NormalizeImage": {"scale": 0.00392157, "mean": [0.5, 0.5, 0.5],
                            "std": [0.25, 0.25, 0.25]}},
    ])
    out = t(_img(64))
    assert out.shape == (32, 32, 3) and out.dtype == np.float32
    # normalize math: uint8 255 → (1.0 - 0.5)/0.25 = 2.0
    white = NormalizeImage(scale=1 / 255.0, mean=[0.5] * 3, std=[0.25] * 3)(
        Image.fromarray(np.full((4, 4, 3), 255, np.uint8)))
    assert np.allclose(white, 2.0, atol=1e-3)


def test_rrc_scale_bounds():
    rrc = RandomResizedCrop(32, scale=(0.5, 1.0))
    img = _img(64)
    for _ in range(20):
        x, y, cw, ch = rrc.get_params(img)
        area_frac = (cw * ch) / (64 * 64)
        assert 0.4 <= area_frac <= 1.01  # sampling within (slightly fuzzy) bounds
        assert 0 <= x <= 64 - cw and 0 <= y <= 64 - ch
    assert rrc(img).size == (32, 32)


def test_two_views_differ():
    t = TwoViewsTransform(Compose([RandomResizedCrop(16, scale=(0.3, 0.9)),
                                   NormalizeImage()]))
    v1, v2 = t(_img(64))
    assert v1.shape == v2.shape == (16, 16, 3)
    assert not np.allclose(v1, v2)  # independent crops


def test_mixup_cutmix_soft_labels():
    rs = np.random.RandomState(0)
    imgs = rs.rand(8, 16, 16, 3).astype(np.float32)
    labels = np.arange(8) % 4
    mi, my = Mixup(alpha=0.4, num_classes=4)((imgs, labels))
    assert my.shape == (8, 4)
    assert np.allclose(my.sum(axis=1), 1.0, atol=1e-5)
    ci, cy = Cutmix(alpha=1.0, num_classes=4)((imgs, labels))
    assert ci.shape == imgs.shape and np.allclose(cy.sum(axis=1), 1.0, atol=1e-5)


def test_loader_with_worker_pool():
    from passl_tpu.data import build_dataloader

    dl = build_dataloader({
        "dataset": {"name": "SyntheticDataset", "size": 24, "image_size": 8,
                    "num_classes": 3,
                    "transform": [{"NormalizeImage": {"scale": 0.00392157}}]},
        "sampler": {"batch_size": 8, "shuffle": True, "drop_last": True},
        "loader": {"num_workers": 2, "prefetch": 1},
    }, "Train", seed=3)
    batches = list(dl)
    assert len(batches) == 3
    imgs, labels = batches[0]
    assert imgs.shape == (8, 8, 8, 3) and labels.shape == (8,)
    dl.close()


def test_cv2_backend_parity():
    """cv2 backend (reference UnifiedResize basic_transforms.py:186-198 +
    preprocess/cv2_trans.py): crop-box distribution identical to PIL
    (same sampler code/RNG stream), resize values within tolerance,
    flip/solarize bit-equal, grayscale close."""
    import random

    from PIL import Image

    from passl_tpu.data.transforms import (BYOLSolarize, DecodeImage,
                                           RandFlipImage, RandomGrayscale,
                                           RandomResizedCrop, Resize)

    rs = np.random.RandomState(0)
    raw = rs.randint(0, 256, (64, 80, 3), np.uint8)
    pil = Image.fromarray(raw)

    # identical RRC crop boxes: get_params consumes the same RNG stream
    rrc_pil = RandomResizedCrop(32, backend="pil")
    rrc_cv2 = RandomResizedCrop(32, backend="cv2")
    random.seed(7)
    boxes_pil = [rrc_pil.get_params(pil) for _ in range(200)]
    random.seed(7)
    boxes_cv2 = [rrc_cv2.get_params(raw) for _ in range(200)]
    assert boxes_pil == boxes_cv2

    # resize parity: smooth gradient image, bilinear, mean abs diff small
    grad = np.tile(np.linspace(0, 255, 80, dtype=np.float32)[None, :, None], (64, 1, 3)).astype(np.uint8)
    out_pil = np.asarray(Resize(32, backend="pil")(Image.fromarray(grad)), np.float32)
    out_cv2 = np.asarray(Resize(32, backend="cv2")(grad), np.float32)
    assert out_pil.shape == out_cv2.shape
    assert np.abs(out_pil - out_cv2).mean() < 2.0

    # flip: ndarray path mirrors the PIL path exactly
    random.seed(1)
    f_pil = np.asarray(RandFlipImage(prob=1.0)(pil))
    f_cv2 = RandFlipImage(prob=1.0)(raw)
    np.testing.assert_array_equal(f_pil, f_cv2)

    # solarize: LUT-equal
    s_pil = np.asarray(BYOLSolarize(threshold=128, p=1.0)(pil))
    s_cv2 = BYOLSolarize(threshold=128, p=1.0)(raw)
    np.testing.assert_array_equal(s_pil, s_cv2)

    # grayscale: same ITU-R 601 luma, small rounding differences
    g_pil = np.asarray(RandomGrayscale(p=1.0)(pil), np.float32)
    g_cv2 = RandomGrayscale(p=1.0)(raw).astype(np.float32)
    assert np.abs(g_pil - g_cv2).mean() < 1.0

    # decode: cv2 backend yields ndarray, PIL backend a PIL image
    assert isinstance(DecodeImage(backend="cv2")(raw), np.ndarray)
    assert not isinstance(DecodeImage(backend="pil")(raw), np.ndarray)


def test_cv2_full_pipeline_end_to_end():
    """A cv2-backend transform stack runs through build_transform and
    produces a normalized float array of the right shape."""
    from passl_tpu.data.transforms import build_transform

    t = build_transform([
        {"DecodeImage": {"backend": "cv2"}},
        {"RandomResizedCrop": {"size": 16, "backend": "cv2"}},
        {"ColorJitter": {"brightness": 0.4, "contrast": 0.4, "saturation": 0.4,
                         "hue": 0.1, "prob": 1.0}},
        {"RandomGrayscale": {"prob": 0.2}},
        {"SimCLRGaussianBlur": {"sigma": [0.1, 2.0], "p": 1.0}},
        {"BYOLSolarize": {"threshold": 128, "p": 0.5}},
        {"RandFlipImage": {"prob": 0.5}},
        {"NormalizeImage": {"scale": 0.00392157}},
    ])
    rs = np.random.RandomState(1)
    out = t(rs.randint(0, 256, (24, 24, 3), np.uint8))
    assert out.shape == (16, 16, 3) and out.dtype == np.float32
    assert np.isfinite(out).all()


def test_pipelined_pool_preserves_batch_order_and_content():
    """The per-sample pipelined pool must yield the same batches in the
    same order as the sequential path (deterministic transform)."""
    from passl_tpu.data import build_dataloader

    def make(workers):
        return build_dataloader({
            "dataset": {"name": "SyntheticDataset", "size": 48, "image_size": 8,
                        "num_classes": 3,
                        "transform": [{"NormalizeImage": {"scale": 0.00392157}}]},
            "sampler": {"batch_size": 8, "shuffle": True, "drop_last": True},
            "loader": {"num_workers": workers, "prefetch": 3},
        }, "Train", seed=11)

    seq = make(0)
    par = make(2)
    seq.set_epoch(1)
    par.set_epoch(1)
    a = list(seq)
    b = list(par)
    assert len(a) == len(b) == 6
    for (ia, la), (ib, lb) in zip(a, b):
        np.testing.assert_array_equal(la, lb)
        np.testing.assert_allclose(ia, ib)
    seq.close()
    par.close()


def test_loader_error_propagates_not_truncates():
    """A failing sample must fail the epoch loudly (not silently end it)."""
    import pytest as _pytest

    from passl_tpu.data.datasets import Dataset
    from passl_tpu.data.loader import DataLoader, DistributedBatchSampler

    class Bad(Dataset):
        def __len__(self):
            return 32

        def __getitem__(self, idx):
            if idx == 19:
                raise ValueError("corrupt sample")
            return np.zeros((4, 4, 3), np.float32), 0

    ds = Bad()
    dl = DataLoader(ds, DistributedBatchSampler(32, 8, shuffle=False, drop_last=True),
                    num_workers=0, prefetch=2)
    with _pytest.raises(RuntimeError, match="dataloader worker failed"):
        list(dl)


def test_loader_set_skip_is_index_level():
    """set_skip drops batches before any fetch happens."""
    from passl_tpu.data.datasets import Dataset
    from passl_tpu.data.loader import DataLoader, DistributedBatchSampler

    fetched = []

    class Tracking(Dataset):
        def __len__(self):
            return 32

        def __getitem__(self, idx):
            fetched.append(idx)
            return np.zeros((2, 2, 3), np.float32), idx

    dl = DataLoader(Tracking(), DistributedBatchSampler(32, 8, shuffle=False, drop_last=True),
                    num_workers=0, prefetch=0)
    dl.set_skip(2)
    batches = list(dl)
    assert len(batches) == 2  # 4 total - 2 skipped
    assert min(fetched) == 16  # first two batches never touched
    # skip is one-shot
    assert len(list(dl)) == 4


def _aug_loader(seed=7, num_workers=0, num_replicas=1, rank=0, bs=4):
    """Loader over a random-transform stack whose output is a pure
    function of the per-sample RNG keys."""
    from passl_tpu.data import build_dataloader

    dl = build_dataloader({
        "dataset": {"name": "SyntheticDataset", "size": 16, "image_size": 16,
                    "num_classes": 3,
                    "transform": [
                        {"RandomResizedCrop": {"size": 12, "scale": [0.3, 1.0]}},
                        {"RandFlipImage": {"prob": 0.5}},
                        {"NormalizeImage": {"scale": 0.00392157}},
                    ]},
        "sampler": {"batch_size": bs, "shuffle": True, "drop_last": True},
        "loader": {"num_workers": num_workers, "prefetch": 1},
    }, "Train", seed=seed)
    dl.batch_sampler.num_replicas = num_replicas
    dl.batch_sampler.rank = rank
    dl.batch_sampler.num_samples = dl.batch_sampler.dataset_len // num_replicas
    return dl


def test_aug_deterministic_across_runs():
    """Host-side augmentation must be a pure function of (seed, epoch,
    stream position) — NOT of interpreter RNG state (the pre-round-4
    bug: num_workers=0 never seeded the ambient RNGs, so the same
    config produced different aug streams run to run; CAE learning
    probes swung 0.21-0.69)."""
    import random as pyrandom

    outs = []
    for perturb in (0, 12345):
        pyrandom.seed(perturb)  # ambient state must not matter
        np.random.seed(perturb + 1)
        dl = _aug_loader()
        dl.set_epoch(0)
        outs.append(np.concatenate([np.asarray(b[0]).ravel() for b in dl]))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_aug_invariant_to_worker_count():
    """num_workers=0 vs 2 must produce byte-identical batches (keys are
    per sample, not per worker — stronger than the reference's
    worker_init_fn streams where aug depends on worker assignment)."""
    dls = [_aug_loader(num_workers=0), _aug_loader(num_workers=2)]
    outs = []
    for dl in dls:
        dl.set_epoch(1)
        outs.append(np.stack([np.asarray(b[0]) for b in dl]))
        dl.close()
    np.testing.assert_array_equal(outs[0], outs[1])


def test_aug_invariant_to_process_topology():
    """The union of 2 ranks' augmented samples == the 1-rank run's
    samples (per-sample keys use the GLOBAL stream position, so a
    sample's aug doesn't depend on which process owns it — this is what
    makes the multiprocess loss-match check meaningful under aug)."""
    one = _aug_loader(num_replicas=1, rank=0, bs=4)
    one.set_epoch(2)
    full = np.concatenate([np.asarray(b[0]) for b in one])  # [16, ...]

    r0 = _aug_loader(num_replicas=2, rank=0, bs=2)
    r1 = _aug_loader(num_replicas=2, rank=1, bs=2)
    r0.set_epoch(2)
    r1.set_epoch(2)
    part0 = np.concatenate([np.asarray(b[0]) for b in r0])  # positions 0::2
    part1 = np.concatenate([np.asarray(b[0]) for b in r1])  # positions 1::2
    merged = np.empty_like(full)
    merged[0::2] = part0
    merged[1::2] = part1
    np.testing.assert_array_equal(full, merged)


def test_batch_transform_deterministic():
    """Mixup draws from the ambient RNG; the loader keys it per batch."""
    from passl_tpu.data import build_dataloader

    def make():
        return build_dataloader({
            "dataset": {"name": "SyntheticDataset", "size": 16, "image_size": 8,
                        "num_classes": 4,
                        "transform": [{"NormalizeImage": {"scale": 0.00392157}}]},
            "sampler": {"batch_size": 8, "shuffle": False, "drop_last": True},
            "loader": {"num_workers": 0},
            "batch_transform": [{"Mixup": {"alpha": 0.8, "num_classes": 4}}],
        }, "Train", seed=11)

    import random as pyrandom

    a = []
    for perturb in (0, 999):
        pyrandom.seed(perturb)
        np.random.seed(perturb)
        dl = make()
        dl.set_epoch(0)
        a.append([np.asarray(b[1]) for b in dl])
    for x, y in zip(a[0], a[1]):
        np.testing.assert_array_equal(x, y)


def test_sklearn_digits_real_dataset():
    """SklearnDigits: the rig's only REAL image dataset (UCI scanned
    digits via sklearn). Split must be deterministic, disjoint, and
    label-complete; items must flow through the standard transform
    stack (reference-in-spirit: configs/simclr/simclr_r18_cifar10.yaml,
    the reference's smallest real-data recipe)."""
    from passl_tpu.data.datasets import SklearnDigits

    tr = SklearnDigits(mode="train")
    te = SklearnDigits(mode="test")
    assert len(tr) + len(te) == 1797 and len(te) == 297
    # disjoint + deterministic: re-instantiation yields identical splits
    tr2 = SklearnDigits(mode="train")
    np.testing.assert_array_equal(tr.labels, tr2.labels)
    np.testing.assert_array_equal(tr.data[0], tr2.data[0])
    key = lambda d: {d.data[i].tobytes() for i in range(len(d))}
    assert not (key(tr) & key(te))
    # every class present in both splits
    assert set(tr.labels) == set(range(10)) == set(te.labels)
    # transform stack applies: uint8 8x8 gray -> normalized 32x32x3
    ds = SklearnDigits(mode="test", transform=[
        {"Resize": {"size": 32}},
        {"NormalizeImage": {"scale": 1 / 255.0, "mean": [0.5] * 3, "std": [0.25] * 3}},
    ])
    img, lab = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert 0 <= lab < 10
