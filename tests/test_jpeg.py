"""Gates for the stdlib+numpy baseline JPEG codec (functions/jpeg.py)
and its wiring into the PDF DCTDecode path and the media decode stage."""

import numpy as np
import pytest

from open_parse_ray.functions.jpeg import (
    _D,
    JpegError,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 3) % 256, (xx * 5) % 256, ((yy + xx) * 2) % 256], axis=2
    ).astype(np.uint8)


def test_dct_matrix_orthonormal():
    assert np.allclose(_D @ _D.T, np.eye(8), atol=1e-12)
    blk = np.arange(64, dtype=np.float64).reshape(8, 8)
    assert np.allclose(_D.T @ (_D @ blk @ _D.T) @ _D, blk, atol=1e-9)


def test_uniform_gray_exact():
    img = np.full((16, 24), 128, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == (16, 24)
    assert np.array_equal(out, img)


@pytest.mark.parametrize(
    "sub,quality,bound",
    [("444", 95, 3), ("444", 75, 6), ("420", 95, 6), ("420", 75, 12)],
)
def test_roundtrip_tolerance(sub, quality, bound):
    img = _gradient(33, 41)
    out = decode_jpeg(encode_jpeg(img, quality=quality, subsampling=sub))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= bound


def test_smooth_image_high_quality_tight():
    yy, xx = np.mgrid[0:40, 0:56]
    sm = (128 + 100 * np.sin(yy / 10.0) * np.cos(xx / 12.0)).astype(np.uint8)
    smc = np.stack([sm, sm, sm], axis=2)
    out = decode_jpeg(encode_jpeg(smc, quality=95))
    assert np.abs(out.astype(int) - smc.astype(int)).max() <= 2


@pytest.mark.parametrize("sub", ["444", "420"])
def test_restart_interval_decode_identical(sub):
    img = _gradient(40, 56)
    base = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
    for ri in (1, 2, 5):
        out = decode_jpeg(
            encode_jpeg(img, quality=90, subsampling=sub, restart_interval=ri)
        )
        assert np.array_equal(out, base)


def test_encoder_deterministic():
    img = _gradient(17, 19)
    assert encode_jpeg(img, 80) == encode_jpeg(img, 80)


def test_rejects_bad_inputs():
    with pytest.raises(JpegError):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(JpegError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # EOI before scan
    img = _gradient(9, 9)
    enc = bytearray(encode_jpeg(img, 90))
    # flip SOF0 (0xC0) to SOF2 (0xC2): progressive must be rejected
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    with pytest.raises(JpegError):
        decode_jpeg(bytes(enc))
    with pytest.raises(JpegError):
        encode_jpeg(img.astype(np.float64))  # wrong dtype
    with pytest.raises(JpegError):
        encode_jpeg(img, subsampling="411")


def test_corruption_fuzz_never_hangs():
    """Every single-byte corruption either decodes (to the right shape)
    or raises — never hangs, never crashes the interpreter (the repo's
    strict-advance fuzz contract for binary parsers)."""
    rng = np.random.RandomState(11)
    img = _gradient(16, 16)
    enc = encode_jpeg(img, 85)
    for _ in range(200):
        buf = bytearray(enc)
        pos = rng.randint(0, len(buf))
        buf[pos] = rng.randint(0, 256)
        try:
            out = decode_jpeg(bytes(buf))
            assert out.ndim in (2, 3)
        except Exception:
            pass  # raising is fine; hanging is not
    for cut in (2, 10, len(enc) // 2, len(enc) - 1):
        try:
            decode_jpeg(enc[:cut])
        except Exception:
            pass


def test_truncated_entropy_raises():
    img = _gradient(24, 24)
    enc = encode_jpeg(img, 85)
    with pytest.raises(JpegError):
        decode_jpeg(enc[: len(enc) - 10])


# ----------------------------------------------------- PDF integration


def test_pdf_dctdecode_images_roundtrip():
    """JpegImage pages embed as /DCTDecode XObjects; the parser returns
    ImageElements carrying the raw JPEG payload with mimetype
    image/jpeg (the reference's DCTDecode semantics, core.py:83-84),
    and the payload decodes back to ~the source raster."""
    from open_parse_ray.functions.pdf import JpegImage, parse_pdf, typeset_pdf
    from open_parse_ray.model import ImageElement

    yy, xx = np.mgrid[0:24, 0:32]
    smooth = (128 + 90 * np.sin(yy / 8.0) * np.cos(xx / 9.0)).astype(np.uint8)
    src = np.stack([smooth, smooth[::-1], smooth], axis=2)
    pdf = typeset_pdf("words around the figure " * 30, images=[JpegImage(src, quality=95)])
    ims = [e for e in parse_pdf(pdf) if isinstance(e, ImageElement)]
    assert len(ims) == 1
    assert ims[0].image_mimetype == "image/jpeg"
    dec = decode_jpeg(ims[0].image)
    assert dec.shape == src.shape
    assert np.abs(dec.astype(int) - src.astype(int)).max() <= 4


def test_pdf_undecodable_dct_skipped():
    """A corrupt DCTDecode XObject is skipped (return-None-on-error
    contract), not raised, and text extraction is unaffected."""
    from open_parse_ray.functions.pdf import JpegImage, parse_pdf, typeset_pdf
    from open_parse_ray.model import ImageElement

    src = _gradient(16, 16)
    pdf = typeset_pdf("stable text " * 40, images=[JpegImage(src)])
    jpeg = encode_jpeg(src, 95)
    # corrupt the embedded jpeg's entropy tail inside the pdf
    broken = pdf.replace(jpeg, jpeg[: len(jpeg) - 12] + b"\x00" * 12)
    els = parse_pdf(broken)
    assert not [e for e in els if isinstance(e, ImageElement)]
    assert any(getattr(e, "text", "") for e in els)


def test_decode_media_stage_handles_jpeg():
    from open_parse_ray.stages.multimodal import DecodeMedia
    import pyarrow as pa

    img = _gradient(20, 28)
    batch = pa.table(
        {
            "media_id": pa.array([7], pa.int64()),
            "payload": pa.array([encode_jpeg(img, 90)], pa.binary()),
        }
    )
    out = DecodeMedia()(batch).to_pylist()[0]
    assert out["status"] == "ok"
    assert (out["width"], out["height"], out["n_frames"]) == (28, 20, 1)


@pytest.mark.parametrize("sub", ["422"])
def test_422_roundtrip_and_odd_dims(sub):
    img = _gradient(33, 41)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsampling=sub))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 6
    for hw in ((17, 19), (16, 19), (17, 20)):
        im2 = img[: hw[0], : hw[1]]
        for s in ("420", "422"):
            assert decode_jpeg(encode_jpeg(im2, 90, s)).shape == im2.shape
    base = decode_jpeg(encode_jpeg(img, 90, "422"))
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img, 90, "422", restart_interval=2)), base
    )
