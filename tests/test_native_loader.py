import numpy as np
import pytest

from putslam_tpu.io import native_loader


def make_dataset(tmp_path, rng, n=6, w=32, h=24):
    from PIL import Image

    rgb_paths, depth_paths, grays, depths = [], [], [], []
    for i in range(n):
        rgb = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        d16 = rng.integers(0, 30000, (h, w)).astype(np.uint16)
        rp = str(tmp_path / f"rgb_{i:05d}.png")
        dp = str(tmp_path / f"depth_{i:05d}.png")
        Image.fromarray(rgb).save(rp)
        Image.fromarray(d16).save(dp)
        rgb_paths.append(rp)
        depth_paths.append(dp)
        grays.append((rgb.astype(np.float32) @
                      np.array([0.299, 0.587, 0.114], np.float32)) / 255.0)
        depths.append(d16.astype(np.float32) / 5000.0)
    return rgb_paths, depth_paths, grays, depths


@pytest.fixture(scope="module")
def built():
    ok = native_loader.build()
    if not ok:
        pytest.skip("native toolchain unavailable")
    return ok


def test_native_decode_matches_pil(tmp_path, rng, built):
    rgb_paths, depth_paths, grays, depths = make_dataset(tmp_path, rng)
    g, d = native_loader.decode_pair(rgb_paths[0], depth_paths[0], 32, 24, 5000.0)
    np.testing.assert_allclose(g, grays[0], atol=2e-3)
    np.testing.assert_allclose(d, depths[0], atol=1e-6)


def test_native_loader_ordered_stream(tmp_path, rng, built):
    rgb_paths, depth_paths, grays, depths = make_dataset(tmp_path, rng, n=10)
    loader = native_loader.NativeLoader(rgb_paths, depth_paths, 32, 24,
                                        n_threads=4, queue_cap=3)
    seen = []
    for idx, g, d in loader:
        seen.append(idx)
        np.testing.assert_allclose(g, grays[idx], atol=2e-3)
        np.testing.assert_allclose(d, depths[idx], atol=1e-6)
    assert seen == list(range(10))
    loader.close()


def test_native_loader_decode_error(tmp_path, rng, built):
    rgb_paths, depth_paths, _, _ = make_dataset(tmp_path, rng, n=3)
    bad = str(tmp_path / "missing.png")
    loader = native_loader.NativeLoader([rgb_paths[0], bad],
                                        [depth_paths[0], depth_paths[1]],
                                        32, 24)
    it = iter(loader)
    idx, g, d = next(it)
    assert idx == 0
    with pytest.raises(IOError):
        next(it)
    loader.close()
