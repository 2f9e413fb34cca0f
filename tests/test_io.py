"""Image I/O: the built-in pure-numpy EXR writer/reader (io_exr.py).

The reference writes EXR frames through mi.Bitmap/OpenEXR
(unpolarized_visualization.py:65-76); parity here is a self-contained
uncompressed scanline EXR implementation."""
import numpy as np

from mitransient_tpu.io_exr import read_exr, write_exr


def test_exr_roundtrip_float(tmp_path):
    img = np.random.RandomState(0).rand(13, 7, 3).astype(np.float32) * 20.0
    p = str(tmp_path / "t.exr")
    write_exr(p, img)
    back, names = read_exr(p)
    assert names == ["B", "G", "R"]  # alphabetical channel order
    np.testing.assert_array_equal(back[..., 2], img[..., 0])  # R
    np.testing.assert_array_equal(back[..., 1], img[..., 1])  # G
    np.testing.assert_array_equal(back[..., 0], img[..., 2])  # B


def test_exr_roundtrip_half_and_mono(tmp_path):
    img = np.random.RandomState(1).rand(5, 9).astype(np.float32)
    p = str(tmp_path / "m.exr")
    write_exr(p, img, half=True)
    back, names = read_exr(p)
    assert names == ["Y"]
    np.testing.assert_allclose(back[..., 0], img, rtol=1e-3)


def test_exr_header_is_standard(tmp_path):
    # magic + version + required attributes present (external readers key
    # on these)
    p = str(tmp_path / "h.exr")
    write_exr(p, np.zeros((2, 2, 4), np.float32))
    buf = open(p, "rb").read()
    assert buf[:4] == bytes([0x76, 0x2F, 0x31, 0x01])
    for attr in (b"channels", b"compression", b"dataWindow",
                 b"displayWindow", b"lineOrder", b"pixelAspectRatio"):
        assert attr in buf


def test_save_frames_exr(tmp_path):
    from mitransient_tpu import vis

    tr = np.random.RandomState(2).rand(4, 6, 3, 1).astype(np.float32)
    vis.save_frames(tr, str(tmp_path), fmt="exr")
    files = sorted(tmp_path.iterdir())
    assert [f.name for f in files] == [
        "frame_0000.exr", "frame_0001.exr", "frame_0002.exr"]
    back, _ = read_exr(str(files[1]))
    np.testing.assert_array_equal(back[..., 0], tr[:, :, 1, 0])
