"""Pure-numpy image decoder unit tests (multimodal.py): synthetic bytes in,
exact pixels out — no Spark session needed."""

import numpy as np
import pytest

from fits2db_spark.operators.multimodal import (
    ImageFormatError,
    decode_bmp,
    decode_image,
    decode_pnm,
    image_features,
    resize_nearest,
)


def _ppm_bytes(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.astype("u1").tobytes()


def _bmp_bytes(img: np.ndarray, bottom_up: bool = True) -> bytes:
    """Minimal uncompressed 24bpp BMP writer (BITMAPINFOHEADER)."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype="u1")
    bgr = img[:, :, [2, 1, 0]]
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    if bottom_up:
        rows = rows[::-1]
    px = rows.tobytes()
    header = bytearray(54)
    header[0:2] = b"BM"
    header[2:6] = (54 + len(px)).to_bytes(4, "little")
    header[10:14] = (54).to_bytes(4, "little")
    header[14:18] = (40).to_bytes(4, "little")
    header[18:22] = w.to_bytes(4, "little")
    header[22:26] = (h if bottom_up else -h).to_bytes(4, "little", signed=True)
    header[26:28] = (1).to_bytes(2, "little")
    header[28:30] = (24).to_bytes(2, "little")
    return bytes(header) + px


RNG = np.random.default_rng(7)
IMG = RNG.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)


def test_ppm_roundtrip_exact_pixels():
    np.testing.assert_array_equal(decode_pnm(_ppm_bytes(IMG)), IMG)


def test_ppm_header_comments_and_whitespace():
    blob = b"P6\n# a comment\n 7\t5 # inline\n255\n" + IMG.tobytes()
    np.testing.assert_array_equal(decode_pnm(blob), IMG)


def test_pgm_grayscale():
    g = IMG[:, :, 0:1]
    blob = f"P5\n{g.shape[1]} {g.shape[0]}\n255\n".encode() + g.tobytes()
    out = decode_pnm(blob)
    assert out.shape == (5, 7, 1)
    np.testing.assert_array_equal(out, g)


def test_ppm_16bit_maxval():
    img16 = RNG.integers(0, 65536, size=(3, 4, 3), dtype=np.uint16)
    blob = b"P6\n4 3\n65535\n" + img16.astype(">u2").tobytes()
    np.testing.assert_array_equal(decode_pnm(blob), img16)


def test_bmp_roundtrip_bottom_up_and_top_down():
    np.testing.assert_array_equal(decode_bmp(_bmp_bytes(IMG, True)), IMG)
    np.testing.assert_array_equal(decode_bmp(_bmp_bytes(IMG, False)), IMG)


def test_bmp_row_padding():
    # width 3 -> 9-byte rows padded to 12; padding must not leak into pixels
    img = RNG.integers(0, 256, size=(4, 3, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_bmp(_bmp_bytes(img)), img)


def test_bmp_compressed_rejected():
    blob = bytearray(_bmp_bytes(IMG))
    blob[30:34] = (1).to_bytes(4, "little")  # BI_RLE8
    with pytest.raises(ImageFormatError, match="compressed"):
        decode_bmp(bytes(blob))


def test_pnm_truncated_header_rejected():
    with pytest.raises(ImageFormatError, match="truncated"):
        decode_pnm(b"P6\n7 ")


def test_decode_image_dispatch():
    assert decode_image(_ppm_bytes(IMG)) == (7, 5, 3)
    assert decode_image(_bmp_bytes(IMG)) == (7, 5, 3)
    # unknown formats take the documented deterministic fallback
    w, h, c = decode_image(b"\x89PNG\r\n\x1a\nfakefake")
    assert c == 3 and w >= 64 and h >= 64


def test_resize_nearest_shapes_and_identity():
    up = resize_nearest(IMG, 14, 10)
    assert up.shape == (10, 14, 3)
    np.testing.assert_array_equal(resize_nearest(IMG, 7, 5), IMG)
    # 2x upscale of a constant image stays constant
    const = np.full((2, 2, 3), 9, dtype="u1")
    assert (resize_nearest(const, 4, 4) == 9).all()


def test_image_features_known_values():
    img = np.zeros((2, 2, 3), dtype="u1")
    img[:, :, 0] = 30  # R=30, G=0, B=0 everywhere
    f = image_features(img)
    assert f["mean_r"] == 30.0 and f["mean_g"] == 0.0 and f["mean_b"] == 0.0
    assert f["mean_lum"] == 10.0
    assert f["std_lum"] == 0.0


def _bmp8_bytes(idx: np.ndarray, palette: np.ndarray) -> bytes:
    """Minimal uncompressed 8bpp BMP with a color table."""
    h, w = idx.shape
    stride = (w + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype="u1")
    rows[:, :w] = idx
    px = rows[::-1].tobytes()  # bottom-up
    pal = np.zeros((256, 4), dtype="u1")
    pal[: len(palette)] = palette  # BGRA entries
    header = bytearray(54)
    header[0:2] = b"BM"
    header[10:14] = (54 + 1024).to_bytes(4, "little")
    header[14:18] = (40).to_bytes(4, "little")
    header[18:22] = w.to_bytes(4, "little")
    header[22:26] = h.to_bytes(4, "little")
    header[26:28] = (1).to_bytes(2, "little")
    header[28:30] = (8).to_bytes(2, "little")
    return bytes(header) + pal.tobytes() + px


def test_bmp_8bpp_palette_resolved():
    idx = np.array([[0, 1], [1, 0]], dtype="u1")
    # color palette (BGRA): entry0 = red, entry1 = blue -> must expand to RGB
    color = np.array([[0, 0, 255, 0], [255, 0, 0, 0]], dtype="u1")
    img = decode_bmp(_bmp8_bytes(idx, color))
    assert img.shape == (2, 2, 3)
    np.testing.assert_array_equal(img[0, 0], [255, 0, 0])  # red
    np.testing.assert_array_equal(img[0, 1], [0, 0, 255])  # blue
    # grayscale palette (inverted) -> single channel of palette VALUES
    gray = np.array([[200, 200, 200, 0], [10, 10, 10, 0]], dtype="u1")
    img = decode_bmp(_bmp8_bytes(idx, gray))
    assert img.shape == (2, 2, 1)
    np.testing.assert_array_equal(img[:, :, 0], [[200, 10], [10, 200]])


def test_decode_image_malformed_known_magic_falls_back():
    # valid magic, truncated body: must take the deterministic fallback,
    # never raise out of the batch
    w, h, c = decode_image(b"P6\n100 100\n255\nxx")
    assert (w, h, c) == (64 + ord("P") % 192, 64 + ord("x") % 192, 3)
    w2, h2, c2 = decode_image(b"BMgarbage")
    assert c2 == 3 and w2 >= 64 and h2 >= 64


def test_dhash_golden_vertical_edge():
    # 2x2 image, left column bright, right column dark: the 9-wide sample
    # grid maps columns 0-4 -> pixel col 0 and 5-8 -> pixel col 1, so the
    # only brighter-than-right-neighbor comparisons are at grid col 4
    # (k % 8 == 4), for every full row r=0..6 within the 60-bit budget
    import numpy as np

    from fits2db_spark.operators.multimodal import dhash_bits

    img = np.zeros((2, 2, 3), dtype="u1")
    img[:, 0, :] = 255
    expected = sum(1 << k for k in (4, 12, 20, 28, 36, 44, 52))
    assert dhash_bits(img) == expected


def test_dhash_invariances():
    import numpy as np

    from fits2db_spark.operators.multimodal import dhash_bits, resize_nearest

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (16, 12, 3)).astype("u1")
    h = dhash_bits(img)
    assert 0 <= h < (1 << 60)
    assert dhash_bits(img.copy()) == h  # deterministic
    # nearest-neighbor upscale by an integer factor preserves which source
    # pixel every grid sample hits (out*in//n with in' = 2*in, and the 2x
    # grid index floors back to the same pixel), hence the hash
    up = resize_nearest(img, 24, 32)
    assert dhash_bits(up) == h


def test_phash_near_banding_has_full_recall(spark):
    # pigeonhole guarantee: every pair within hamming <= 3 shares one of
    # the 4 x 15-bit bands, so the banded join must find EXACTLY the pairs
    # a brute-force hamming scan finds
    from tests.conftest import SF_SMOKE

    from fits2db_spark.operators.multimodal import _phash_frame, mm_phash_near

    hashes = {
        r.doc_id: r.phash for r in _phash_frame(spark, SF_SMOKE).collect()
    }
    brute = {
        (a, b)
        for a in hashes
        for b in hashes
        if a < b and bin(hashes[a] ^ hashes[b]).count("1") <= 3
    }
    banded = {
        (r.doc_a, r.doc_b) for r in mm_phash_near(spark, SF_SMOKE).collect()
    }
    assert banded == brute
    assert brute, "fixture should contain at least one near-dup pair"


# ---------------------------------------------------------------------------
# RIFF/WAV codec
# ---------------------------------------------------------------------------


def test_wav_roundtrip_and_features():
    import numpy as np

    from fits2db_spark.operators.multimodal import (
        audio_features,
        decode_wav,
        write_wav,
    )

    x = np.array([100, -100, 200, -200, 300, -300], dtype="<i2")
    rate, back = decode_wav(write_wav(x, 16000))
    assert rate == 16000
    assert (back == x).all()
    f = audio_features(rate, back)
    assert f["n_samples"] == 6 and f["peak"] == 300
    assert abs(f["rms"] - np.sqrt((100**2 + 200**2 + 300**2) / 3.0)) < 1e-9
    assert f["zcr"] == 1.0  # alternating signs: every adjacent pair crosses


def test_wav_chunk_walk_skips_extra_chunks():
    import numpy as np

    from fits2db_spark.operators.multimodal import decode_wav, write_wav

    blob = bytearray(write_wav(np.array([1, -1, 1], dtype="<i2"), 8000))
    # splice a LIST chunk (odd size -> word-aligned) between WAVE and fmt
    extra = b"LIST" + np.uint32(5).tobytes() + b"INFOx" + b"\x00"
    blob[12:12] = extra
    blob[4:8] = np.uint32(len(blob) + len(extra) - 8).tobytes()
    rate, samples = decode_wav(bytes(blob))
    assert rate == 8000 and list(samples) == [1, -1, 1]


def test_wav_stereo_interleave_and_errors():
    import numpy as np
    import pytest

    from fits2db_spark.operators.multimodal import (
        AudioFormatError,
        decode_wav,
        write_wav,
    )

    blob = bytearray(write_wav(np.array([1, 2, 3, 4], dtype="<i2"), 8000))
    blob[22:24] = np.uint16(2).tobytes()  # claim stereo
    rate, samples = decode_wav(bytes(blob))
    assert samples.shape == (2, 2)

    with pytest.raises(AudioFormatError, match="RIFF"):
        decode_wav(b"nope")
    nonpcm = bytearray(write_wav(np.array([1], dtype="<i2")))
    nonpcm[20:22] = np.uint16(3).tobytes()  # IEEE float format tag
    with pytest.raises(AudioFormatError, match="non-PCM"):
        decode_wav(bytes(nonpcm))


def test_audio_peak_full_scale_negative_sample():
    """np.abs(-32768) on int16 wraps back to -32768; peak must come from the
    float copy so a full-scale negative PCM16 sample reports +32768."""
    import numpy as np

    from fits2db_spark.operators.multimodal import audio_features

    f = audio_features(8000, np.array([-32768, 100, -5], dtype="<i2"))
    assert f["peak"] == 32768


def test_audio_segments_match_burst_construction(spark):
    """The VAD must recover exactly the planted burst layout: k segments
    (k = doc_id%4+2), active seconds = sum of burst lengths, longest =
    the last (largest) burst."""
    from tests.conftest import SF_SMOKE

    from fits2db_spark.operators.multimodal import (
        _VAD_FRAME,
        _VAD_RATE,
        mm_audio_segments,
    )

    rows = mm_audio_segments(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        k = r.doc_id % 4 + 2
        m = r.doc_id % 3 + 1
        bursts = [_VAD_FRAME * (j + m) for j in range(1, k + 1)]
        assert r.n_segments == k
        assert abs(r.active_s - sum(bursts) / _VAD_RATE) < 1e-9
        assert abs(r.longest_s - max(bursts) / _VAD_RATE) < 1e-9


def test_patch_grid_covers_image_exactly(spark):
    """Patch rows tile each image exactly ((w/4)*(h/4) patches), and the
    patch-mean average reproduces the whole-image luminance mean."""
    import numpy as np
    import pandas as pd

    from tests.conftest import SF_SMOKE

    from fits2db_spark.operators.multimodal import mm_patch_grid

    pdf = mm_patch_grid(spark, SF_SMOKE).toPandas()
    d = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    d = d[d.doc_id < 100]
    for row in d.itertuples():
        w = (row.n_chars % 4 + 2) * 4
        h = (row.doc_id % 3 + 2) * 4
        sub = pdf[pdf.doc_id == row.doc_id]
        assert len(sub) == (w // 4) * (h // 4), row.doc_id
        assert sub.patch_row.max() == h // 4 - 1
        assert sub.patch_col.max() == w // 4 - 1
        # mean of patch means == image mean (equal-sized patches)
        import hashlib

        body = (hashlib.md5(row.text.encode()).hexdigest() * (3 * w * h // 32 + 1))[
            : 3 * w * h
        ]
        lums = np.frombuffer(body.encode(), "u1").astype("f8").reshape(-1, 3).mean(axis=1)
        assert abs(sub.mean_lum.mean() - lums.mean()) < 1e-3
