"""Native C++ batch decoder: build, decode, fallback, pipeline integration."""

import numpy as np
import pytest
from PIL import Image

from semanticlens_tpu.data import ImageFolder, iter_batches
from semanticlens_tpu.data import native_decoder as nd

pytestmark = pytest.mark.skipif(
    not nd.is_available(), reason="native decoder did not build on this host"
)


@pytest.fixture()
def jpeg_dir(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(10):
        # smooth gradient images: resampling differences stay small
        base = np.linspace(0, 255, 300 * 400 * 3).reshape(300, 400, 3)
        img = ((base + rng.integers(0, 30)) % 256).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / f"img{i:02d}.jpg", quality=95)
    return tmp_path


def test_decode_batch_shapes_and_determinism(jpeg_dir):
    paths = sorted(jpeg_dir.iterdir())
    out, failed = nd.decode_batch(paths, 224)
    assert out.shape == (10, 224, 224, 3) and out.dtype == np.uint8
    assert failed == []
    out2, _ = nd.decode_batch(paths, 224, threads=1)
    np.testing.assert_array_equal(out, out2)  # thread count must not change pixels


def test_decode_close_to_pil(jpeg_dir):
    paths = sorted(jpeg_dir.iterdir())
    out, _ = nd.decode_batch(paths, 224)
    ds = ImageFolder(jpeg_dir, image_size=224, decoder="pil")
    pil = np.stack([ds[i][0] for i in range(len(ds))])
    diff = np.abs(out.astype(int) - pil.astype(int)).mean()
    assert diff < 8, f"native decode diverges from PIL by {diff} mean abs on smooth images"


def test_corrupt_file_flags_and_zero_rows(jpeg_dir):
    paths = sorted(jpeg_dir.iterdir())
    paths[3].write_bytes(b"definitely not a jpeg")
    out, failed = nd.decode_batch(paths, 64)
    assert failed == [3]
    assert out[3].sum() == 0 and out[2].sum() > 0


def test_imagefolder_get_batch_mixed_formats(tmp_path):
    rng = np.random.default_rng(1)
    for i, ext in enumerate(["jpg", "png", "jpg", "png"]):
        img = np.full((64, 80, 3), 40 * i + 10, np.uint8)
        img[:, :40] += rng.integers(0, 20, size=(64, 40, 3), dtype=np.uint8)
        Image.fromarray(img).save(tmp_path / f"m{i}.{ext}")
    ds = ImageFolder(tmp_path, image_size=32)
    block = ds.get_batch(0, 4)
    assert block.shape == (4, 32, 32, 3)
    ref = np.stack([ds[i][0] for i in range(4)])
    # PNGs go through PIL on both paths → exact; JPEGs within resample tolerance
    np.testing.assert_array_equal(block[1], ref[1])
    np.testing.assert_array_equal(block[3], ref[3])
    assert np.abs(block[0].astype(int) - ref[0].astype(int)).mean() < 10


def test_iter_batches_routes_through_get_batch(jpeg_dir):
    calls = []
    ds = ImageFolder(jpeg_dir, image_size=32)
    orig = ds.get_batch
    ds.get_batch = lambda s, e: (calls.append((s, e)), orig(s, e))[1]
    batches = list(iter_batches(ds, 4))
    assert calls == [(0, 4), (4, 8), (8, 10)]
    assert batches[-1].valid.tolist() == [True, True, False, False]


def test_decoder_pil_bypasses_native(jpeg_dir):
    ds = ImageFolder(jpeg_dir, image_size=32, decoder="pil")
    block = ds.get_batch(0, 3)
    ref = np.stack([ds[i][0] for i in range(3)])
    np.testing.assert_array_equal(block, ref)


def test_decoder_arg_validation(jpeg_dir):
    with pytest.raises(ValueError):
        ImageFolder(jpeg_dir, decoder="gpu")


def test_build_failure_degrades_gracefully(monkeypatch, tmp_path):
    """Compiler failure / missing toolchain must leave the decoder
    unavailable (PIL fallback), never raise into the data path."""
    import subprocess

    from semanticlens_tpu.data import native_decoder as nd

    # isolate module state
    monkeypatch.setattr(nd, "_LIB", None)
    monkeypatch.setattr(nd, "_FAILED", False)
    monkeypatch.setattr(nd, "_so_path", lambda: tmp_path / "nope" / "libsldecode.so")

    def boom(*a, **k):
        raise OSError("no compiler")

    monkeypatch.setattr(subprocess, "run", boom)
    assert nd._build() is None
    assert nd._load() is None and nd._FAILED
    assert nd.is_available() is False  # cached failure short-circuits


def test_build_nonzero_exit_cleans_tmp(monkeypatch, tmp_path):
    import subprocess
    import types

    from semanticlens_tpu.data import native_decoder as nd

    monkeypatch.setattr(nd, "_so_path", lambda: tmp_path / "b" / "libsldecode.so")

    def fail_run(cmd, **k):
        return types.SimpleNamespace(returncode=1, stderr="boom")

    monkeypatch.setattr(subprocess, "run", fail_run)
    assert nd._build() is None
    assert not list((tmp_path / "b").glob("*.tmp")), "tmp artifact left behind"
