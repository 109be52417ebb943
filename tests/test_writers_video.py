"""Tests for the AVI container, PNG writers and async writer farm."""

import os

import numpy as np
import pytest
from PIL import Image

from depthrenderer_tpu import video
from depthrenderer_tpu.writers import (
    AsyncImageWriter,
    AsyncVideoWriter,
    ImageWriter,
    VideoWriter,
)


def frames_gradient(n, w, h):
    out = []
    for k in range(n):
        f = np.zeros((h, w, 4), np.uint8)
        f[..., 0] = (k * 37) % 256
        f[..., 1] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
        f[..., 3] = 255
        out.append(f)
    return out


def test_native_jpeg_encoder_roundtrip():
    """The in-house baseline-JPEG encoder (frameops.c, VERDICT r3 #6) must
    produce Pillow-decodable frames at Pillow-equivalent quality."""
    from depthrenderer_tpu import native

    if not native.available():
        pytest.skip("no C compiler for the native library")
    # Smooth natural-ish image (4:2:0 chroma subsampling is part of the
    # format; sharp chroma edges bound ANY baseline encoder the same way).
    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        (128 + 100 * np.sin(xx / 9.0)).astype(np.uint8),
        (128 + 100 * np.cos(yy / 7.0)).astype(np.uint8),
        ((xx + yy) * 255 // (w + h)).astype(np.uint8),
    ], axis=-1)
    jb = native.jpeg_encode(img, quality=92)
    dec = np.asarray(Image.open(__import__("io").BytesIO(jb)).convert("RGB"))
    mse = ((dec.astype(int) - img.astype(int)) ** 2).mean()
    psnr = 10 * np.log10(255**2 / max(mse, 1e-9))
    assert psnr >= 35.0, f"native JPEG roundtrip {psnr:.1f} dB"
    # Pillow at the same quality as the yardstick: within 3 dB.
    import io as _io

    buf = _io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=92)
    pdec = np.asarray(Image.open(_io.BytesIO(buf.getvalue())).convert("RGB"))
    pmse = ((pdec.astype(int) - img.astype(int)) ** 2).mean()
    ppsnr = 10 * np.log10(255**2 / max(pmse, 1e-9))
    assert psnr >= ppsnr - 3.0, f"native {psnr:.1f} vs Pillow {ppsnr:.1f}"


def test_avi_mjpg_native_encoder_path(tmp_path, monkeypatch):
    """The MJPG container path must work end-to-end with the native encoder
    forced (the no-Pillow deployment path)."""
    from depthrenderer_tpu import native

    if not native.available():
        pytest.skip("no C compiler for the native library")
    monkeypatch.setenv("DEPTHRENDERER_FORCE_NATIVE_JPEG", "1")
    w, h, n = 48, 32, 3
    path = tmp_path / "t.avi"
    with video.AviFile(path, (w, h), fps=24, codec="MJPG") as f:
        for frame in frames_gradient(n, w, h):
            f.write(frame)
    frames = video.read_video_frames(path)
    assert len(frames) == n and frames[0].shape[:2] == (h, w)


def test_avi_dib_roundtrip(tmp_path):
    w, h, n = 32, 24, 5
    path = tmp_path / "t.avi"
    with video.AviFile(path, (w, h), fps=12, codec="DIB ") as f:
        for frame in frames_gradient(n, w, h):
            f.write(frame)
    ww, hh, frames, fps = video.read_avi_info(path)
    assert (ww, hh, frames) == (w, h, n)
    assert abs(fps - 12) < 0.1
    # The raw payload of frame 0 must contain the exact BGR bytes (bottom-up).
    data = path.read_bytes()
    assert b"movi" in data and b"idx1" in data


def test_avi_mjpg_decodable(tmp_path):
    w, h, n = 48, 32, 3
    path = tmp_path / "t.avi"
    fs = frames_gradient(n, w, h)
    with video.AviFile(path, (w, h), fps=24, codec="MJPG") as f:
        for frame in fs:
            f.write(frame)
    data = path.read_bytes()
    # Extract the first JPEG chunk and decode it with PIL.
    import struct

    i = data.find(b"00dc")
    size = struct.unpack("<I", data[i + 4 : i + 8])[0]
    jpeg = data[i + 8 : i + 8 + size]
    img = np.asarray(Image.open(__import__("io").BytesIO(jpeg)))
    assert img.shape == (h, w, 3)
    # JPEG is lossy; compare loosely.
    assert abs(int(img[..., 0].mean()) - int(fs[0][..., 0].mean())) < 10


def test_avi_rejects_wrong_size(tmp_path):
    with video.AviFile(tmp_path / "t.avi", (16, 16), codec="DIB ") as f:
        with pytest.raises(ValueError):
            f.write(np.zeros((8, 8, 4), np.uint8))
        f.write(np.zeros((16, 16, 4), np.uint8))


def test_image_writer_sync(tmp_path):
    f = frames_gradient(1, 16, 12)[0]
    ImageWriter().write(f, tmp_path / "a.png")
    back = np.asarray(Image.open(tmp_path / "a.png"))
    np.testing.assert_array_equal(back, f)


def test_async_image_writer_drains(tmp_path):
    w = AsyncImageWriter(num_workers=2)
    fs = frames_gradient(8, 16, 12)
    for i, f in enumerate(fs):
        w.write(f, tmp_path / f"{i}.png")
    w.cleanup()
    for i, f in enumerate(fs):
        back = np.asarray(Image.open(tmp_path / f"{i}.png"))
        np.testing.assert_array_equal(back, f)


def test_async_video_writer_order(tmp_path):
    # Frames must land in submit order (single encoder thread + FIFO).
    path = tmp_path / "v.avi"
    w = AsyncVideoWriter(path, (32, 24), fps=10, codec="DIB ")
    fs = frames_gradient(12, 32, 24)
    for f in fs:
        w.write(f)
    w.cleanup()
    _, _, frames, _ = video.read_avi_info(path)
    assert frames == 12
    # Decode the raw DIB payloads and check frame order via the red channel.
    import struct

    data = path.read_bytes()
    pos = 0
    reds = []
    while True:
        i = data.find(b"00db", pos)
        if i < 0:
            break
        size = struct.unpack("<I", data[i + 4 : i + 8])[0]
        payload = data[i + 8 : i + 8 + size]
        if size == 32 * 24 * 3:  # skip the idx1 entries that also contain '00db'
            arr = np.frombuffer(payload, np.uint8).reshape(24, 32, 3)
            reds.append(int(arr[0, 0, 2]))  # BGR -> red at index 2
        pos = i + 8 + size
    assert reds == [(k * 37) % 256 for k in range(12)]


def test_video_writer_creates_dirs(tmp_path):
    path = tmp_path / "deep" / "dir" / "v.avi"
    w = VideoWriter(path, (16, 16), fps=5, codec="DIB ")
    w.write(np.zeros((16, 16, 4), np.uint8))
    w.cleanup()
    assert path.exists()


def test_mp4_writer_native_without_ffmpeg(tmp_path, monkeypatch):
    """A .mp4 target without ffmpeg must still produce a real MP4 via the
    native MJPEG remux (VERDICT r2 next #6: an MP4 artifact; ffmpeg is absent
    in this image)."""
    from depthrenderer_tpu import video as video_mod
    from depthrenderer_tpu.writers import VideoWriter

    monkeypatch.setattr(video_mod, "ffmpeg_available", lambda: False)
    out = tmp_path / "clip.mp4"
    w = VideoWriter(out, (32, 16), fps=12)
    frame = np.zeros((16, 32, 4), np.uint8)
    frame[..., 0] = 200
    for _ in range(3):
        w.write(frame)
    w.cleanup()
    assert out.exists() and w.path == str(out)
    ww, hh, n, fps = video.read_mp4_info(out)
    assert (ww, hh, n) == (32, 16, 3)
    assert abs(fps - 12) < 0.01
    frames = video.read_mp4_frames(out)
    assert len(frames) == 3 and frames[0].shape == (16, 32, 3)
    assert abs(int(frames[0][..., 0].mean()) - 200) < 10  # JPEG-lossy red


def test_mp4_roundtrip(tmp_path):
    w, h, n = 48, 32, 5
    path = tmp_path / "t.mp4"
    fs = frames_gradient(n, w, h)
    with video.Mp4File(path, (w, h), fps=24) as f:
        for frame in fs:
            f.write(frame)
    data = path.read_bytes()
    assert data[4:8] == b"ftyp" and b"moov" in data and b"jpeg" in data
    ww, hh, frames, fps = video.read_mp4_info(path)
    assert (ww, hh, frames) == (w, h, n)
    assert abs(fps - 24) < 0.01
    back = video.read_mp4_frames(path)
    assert len(back) == n
    for k, img in enumerate(back):
        assert img.shape == (h, w, 3)
        assert abs(int(img[..., 0].mean()) - (k * 37) % 256) < 10


def test_remux_avi_to_mp4_payload_identical(tmp_path):
    """MJPG AVI chunks must move into the MP4 byte-identical (remux, not
    re-encode)."""
    import struct

    w, h, n = 40, 24, 4
    avi = tmp_path / "t.avi"
    with video.AviFile(avi, (w, h), fps=30, codec="MJPG") as f:
        for frame in frames_gradient(n, w, h):
            f.write(frame)
    mp4 = video.remux_avi_to_mp4(avi)
    assert mp4.endswith(".mp4") and os.path.exists(mp4)
    # First JPEG payload in the AVI == first sample bytes in the MP4.
    adata = avi.read_bytes()
    i = adata.find(b"00dc")
    size = struct.unpack("<I", adata[i + 4 : i + 8])[0]
    jpeg = adata[i + 8 : i + 8 + size]
    mdata = open(mp4, "rb").read()
    assert jpeg in mdata
    ww, hh, frames, fps = video.read_mp4_info(mp4)
    assert (ww, hh, frames) == (w, h, n) and abs(fps - 30) < 0.01


def test_remux_avi_dib_to_mp4(tmp_path):
    """Raw-DIB AVIs remux too (frames JPEG-encoded on the way through)."""
    w, h, n = 32, 16, 3
    avi = tmp_path / "raw.avi"
    with video.AviFile(avi, (w, h), fps=10, codec="DIB ") as f:
        for frame in frames_gradient(n, w, h):
            f.write(frame)
    mp4 = video.remux_avi_to_mp4(avi, remove_source=True)
    assert not avi.exists()
    back = video.read_mp4_frames(mp4)
    assert len(back) == n and back[0].shape == (h, w, 3)
    assert abs(int(back[1][..., 0].mean()) - 37) < 10


def test_yuv420_pack_and_native_encoder(tmp_path):
    """Device-side YUV420 pack -> native planar encoder -> decodable AVI at
    RGB-path-equivalent quality (the round-5 farm readback format: 1.5 B/px
    through the d->h link instead of 4; VERDICT r4 ask #6)."""
    from depthrenderer_tpu import io as dio, native

    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        (128 + 100 * np.sin(xx / 9.0)).astype(np.uint8),
        (128 + 100 * np.cos(yy / 7.0)).astype(np.uint8),
        ((xx + yy) * 255 // (w + h)).astype(np.uint8),
        np.full((h, w), 255, np.uint8),
    ], axis=-1)
    packed = np.asarray(dio.rgba_to_yuv420(img))
    assert packed.shape == (h * w * 3 // 2,) and packed.dtype == np.uint8
    # The pack's own information loss is chroma subsampling only.
    up = dio.yuv420_to_rgb(packed, h, w)
    mse = ((up.astype(int) - img[..., :3].astype(int)) ** 2).mean()
    assert 10 * np.log10(255**2 / max(mse, 1e-9)) >= 30.0

    cq = h * w // 4
    y = packed[:h * w].reshape(h, w)
    cb = packed[h * w:h * w + cq].reshape(h // 2, w // 2)
    cr = packed[h * w + cq:].reshape(h // 2, w // 2)

    path = tmp_path / "yuv.avi"
    vw = AsyncVideoWriter(path, (w, h), fps=10, codec="MJPG")
    for _ in range(3):
        vw.write_yuv420(y, cb, cr)
    vw.cleanup()
    _, _, frames, _ = video.read_avi_info(path)
    assert frames == 3

    if native.available():
        # Planar encode must agree with the RGB-input encoder (same tables,
        # same subsampling; only float rounding in the colour path differs).
        jb_yuv = native.jpeg_encode_yuv420(y, cb, cr, quality=92)
        jb_rgb = native.jpeg_encode(img[..., :3], quality=92)
        import io as _io

        d_yuv = np.asarray(Image.open(_io.BytesIO(jb_yuv)).convert("RGB"))
        d_rgb = np.asarray(Image.open(_io.BytesIO(jb_rgb)).convert("RGB"))
        mse = ((d_yuv.astype(int) - d_rgb.astype(int)) ** 2).mean()
        assert 10 * np.log10(255**2 / max(mse, 1e-9)) >= 40.0
