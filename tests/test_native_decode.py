"""Native C++ JPEG decode+RRC worker (passl_tpu/native/decode.cc):
the TPU-world equivalent of the reference's C++ DataLoader/DALI input
path (passl/data/__init__.py:72-80)."""
import io

import numpy as np
import pytest

from passl_tpu import native


def _jpeg_bytes(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native toolchain unavailable")


@needs_native
def test_jpeg_size():
    rs = np.random.RandomState(0)
    b = _jpeg_bytes(rs.randint(0, 256, (48, 80, 3), np.uint8))
    assert native.jpeg_size(b) == (80, 48)


@needs_native
def test_decode_crop_resize_matches_pil():
    from PIL import Image

    # smooth gradient so JPEG loss + bilinear differences stay small
    g = np.linspace(0, 255, 256, dtype=np.float32)
    arr = (0.5 * g[None, :, None] + 0.5 * g[:256, None, None]).astype(np.uint8)
    arr = np.repeat(arr, 3, axis=2)
    b = _jpeg_bytes(arr)

    box = (32, 48, 160, 128)  # x, y, cw, ch
    out = native.decode_crop_resize(b, box, 64)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8

    pil = Image.open(io.BytesIO(b)).convert("RGB")
    ref = pil.crop((32, 48, 32 + 160, 48 + 128)).resize((64, 64), Image.BILINEAR)
    diff = np.abs(out.astype(np.float32) - np.asarray(ref, np.float32))
    assert diff.mean() < 4.0, diff.mean()

    flipped = native.decode_crop_resize(b, box, 64, flip=True)
    np.testing.assert_array_equal(flipped, out[:, ::-1])


@needs_native
def test_native_rrc_transform_and_raw_bytes_dataset(tmp_path):
    from PIL import Image

    from passl_tpu.data import build_dataloader

    rs = np.random.RandomState(1)
    for i in range(8):
        Image.fromarray(rs.randint(0, 256, (120, 160, 3), np.uint8)).save(
            tmp_path / f"i{i}.jpg", quality=90)
    with open(tmp_path / "list.txt", "w") as f:
        for i in range(8):
            f.write(f"i{i}.jpg {i % 2}\n")

    dl = build_dataloader({
        "dataset": {"name": "ImageNetDataset", "image_root": str(tmp_path),
                    "cls_label_path": str(tmp_path / "list.txt"),
                    "raw_bytes": True,
                    "transform": [{"TwoViewsTransform": {"base_transform1": [
                        {"NativeJpegRRC": {"size": 32, "scale": [0.2, 1.0]}},
                    ]}}]},
        "sampler": {"batch_size": 4, "shuffle": True, "drop_last": True},
        "loader": {"num_workers": 0},
    }, "Train", seed=0)
    (v1, v2), labels = next(iter(dl))
    assert v1.shape == (4, 32, 32, 3) and v1.dtype == np.uint8
    assert v2.shape == (4, 32, 32, 3)
    assert not np.array_equal(v1, v2)  # independent crops
    dl.close()


@needs_native
def test_dct_scaled_decode_large_crop():
    """Large source crop triggers the 1/2..1/8 DCT-scaled decode path;
    result must still match a full decode + resize within tolerance."""
    from PIL import Image

    g = np.linspace(0, 255, 1024, dtype=np.float32)
    arr = (0.5 * g[None, :, None] + 0.5 * g[:768, None, None][:768]).astype(np.uint8)
    arr = np.repeat(arr.reshape(768, 1024, 1), 3, axis=2)
    b = _jpeg_bytes(arr)
    box = (0, 0, 1024, 768)
    out = native.decode_crop_resize(b, box, 96)
    pil = Image.open(io.BytesIO(b)).convert("RGB").resize((96, 96), Image.BILINEAR)
    diff = np.abs(out.astype(np.float32) - np.asarray(pil, np.float32))
    assert diff.mean() < 6.0, diff.mean()
