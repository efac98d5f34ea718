"""Native C++ IO library: equivalence with the PIL/numpy fallbacks."""

import numpy as np
import pytest
from PIL import Image

from panoptic_forecasting_tpu import native


def test_native_builds_and_loads():
    assert native.available(), "libpf_native.so failed to build/load"


def test_io_filter_profile_matches_native_constant():
    """data/io.PNG_IDS keeps its own PNG_FILTER_NONE literal (io must not
    trigger the native build at import); pin it to the native constant."""
    from panoptic_forecasting_tpu.data.io import PNG_IDS

    assert PNG_IDS["filters"] == native.FILTER_NONE


@pytest.mark.parametrize(
    "arr",
    [
        np.random.RandomState(0).randint(0, 256, (37, 53), np.uint8),
        np.random.RandomState(1).randint(0, 256, (16, 24, 3), np.uint8),
        np.random.RandomState(2).randint(0, 65536, (21, 33), np.uint16),
    ],
    ids=["gray8", "rgb8", "gray16"],
)
def test_png_roundtrip_matches_pil(tmp_path, arr):
    p_native = str(tmp_path / "n.png")
    p_pil = str(tmp_path / "p.png")
    native.save_png(p_native, arr)
    Image.fromarray(arr).save(p_pil)
    # native reads both its own file and PIL's, bit-exact
    np.testing.assert_array_equal(native.load_png(p_native), arr)
    np.testing.assert_array_equal(native.load_png(p_pil), arr)
    # and PIL reads the native file back bit-exact
    np.testing.assert_array_equal(np.array(Image.open(p_native)), arr)


@pytest.mark.parametrize(
    "arr",
    [
        np.random.RandomState(3).randint(0, 34, (37, 53), np.uint8),
        np.random.RandomState(4).randint(0, 256, (16, 24, 3), np.uint8),
        np.random.RandomState(5).randint(0, 65536, (21, 33), np.uint16),
    ],
    ids=["ids8", "rgb8", "gray16"],
)
def test_png_filter_profiles_lossless(tmp_path, arr):
    """PNG stays lossless under every write profile (the filter/level
    choice is pure speed/size, data/io.PNG_IDS + PNG_SMOOTH16) and stays
    readable by PIL."""
    from PIL import Image

    for lvl, flt in ((1, native.FILTER_NONE), (1, native.FILTER_ADAPTIVE),
                     (6, native.FILTER_NONE)):
        p = str(tmp_path / f"f{lvl}_{flt}.png")
        native.save_png(p, arr, compress_level=lvl, filters=flt)
        np.testing.assert_array_equal(native.load_png(p), arr)
        np.testing.assert_array_equal(np.array(Image.open(p)), arr)


def test_png_batch_read(tmp_path):
    rng = np.random.RandomState(3)
    arrs = [rng.randint(0, 256, (20, 30), np.uint8) for _ in range(5)]
    paths = []
    for i, a in enumerate(arrs):
        p = str(tmp_path / f"{i}.png")
        native.save_png(p, a)
        paths.append(p)
    out = native.load_png_batch(paths, num_threads=3)
    np.testing.assert_array_equal(out, np.stack(arrs))


def test_lut_matches_numpy():
    rng = np.random.RandomState(4)
    arr = rng.randint(0, 256, (64, 64), np.uint8)
    lut = rng.permutation(256).astype(np.uint8)
    np.testing.assert_array_equal(native.lut_apply_u8(arr, lut), lut[arr])


def test_depth_codec_matches_python():
    from panoptic_forecasting_tpu.data.io import decode_depth_png

    rng = np.random.RandomState(5)
    png = rng.randint(0, 65536, (40, 50)).astype(np.uint16)
    png[0, :10] = 0
    d_n, v_n = native.decode_depth_png_u16(png)
    d_p, v_p = decode_depth_png(png)
    np.testing.assert_array_equal(v_n, v_p)
    np.testing.assert_allclose(d_n[v_n], d_p[v_p], atol=1e-6)


def test_disparity_codec_matches_python():
    from panoptic_forecasting_tpu.data.io import (
        decode_disparity_png,
        disparity_to_depth,
    )

    rng = np.random.RandomState(6)
    png = rng.randint(0, 65536, (30, 40)).astype(np.uint16)
    png[5] = 0
    png[6] = 1  # encodes disparity exactly 0 -> invalid depth
    bfx = 0.222126 * 2262.52
    d_n, v_n = native.disparity_to_depth_u16(png, bfx)
    disp, dv = decode_disparity_png(png)
    d_p, v_p = disparity_to_depth(disp, dv, baseline=0.222126, fx=2262.52)
    np.testing.assert_array_equal(v_n, v_p)
    np.testing.assert_allclose(d_n[v_n], d_p[v_p], rtol=1e-6)


def test_resize_nearest_matches_pil():
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 34, (48, 96), np.uint8)
    for dh, dw in [(24, 48), (96, 192), (37, 61)]:
        got = native.resize_nearest_u8(arr, dh, dw)
        want = np.array(
            Image.fromarray(arr).resize((dw, dh), Image.NEAREST)
        )
        np.testing.assert_array_equal(got, want)
