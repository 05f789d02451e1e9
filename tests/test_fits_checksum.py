"""CHECKSUM/DATASUM convention: writer stamping, verifier, tamper
detection, and the verifying Spark read path."""

import pytest

from fits2db_spark.sources.fits import (
    FitsFormatError,
    add_checksums,
    encode_checksum,
    read_fits,
    verify_checksums,
    write_fits_multi,
)


def _blob():
    return write_fits_multi(
        [
            {
                "columns": [
                    ("id", "J", list(range(200))),
                    ("v", "D", [i * 1.25 for i in range(200)]),
                    ("name", "A10", [f"obj{i}" for i in range(200)]),
                ],
                "extname": "CAT",
            },
            {"columns": [("x", "E", [0.5, 1.5, 2.5])], "extname": "SMALL"},
        ]
    )


def test_stamped_file_verifies_every_hdu():
    res = verify_checksums(add_checksums(_blob()))
    assert len(res) == 3
    assert all(r["datasum_ok"] and r["checksum_ok"] for r in res)


def test_unstamped_file_reports_unprotected_not_corrupt():
    res = verify_checksums(_blob())
    assert all(r["datasum_ok"] is None and r["checksum_ok"] is None for r in res)


def test_data_tamper_flips_both_checks_only_in_that_hdu():
    cb = bytearray(add_checksums(_blob()))
    cb[-50] ^= 0x01  # inside the last HDU's data area
    res = verify_checksums(bytes(cb))
    assert res[2]["datasum_ok"] is False and res[2]["checksum_ok"] is False
    assert res[0]["checksum_ok"] and res[1]["checksum_ok"]


def test_header_tamper_breaks_checksum_but_not_datasum():
    cb = bytearray(add_checksums(_blob()))
    pos = bytes(cb).index(b"EXTNAME = 'CAT'")
    cb[pos + 11] = ord("X")
    res = verify_checksums(bytes(cb))
    bad = [r for r in res if r["extname"] == "XAT"]
    assert bad and bad[0]["datasum_ok"] is True and bad[0]["checksum_ok"] is False


def test_restamping_is_idempotent_and_replaces_cards():
    once = add_checksums(_blob())
    twice = add_checksums(once)
    assert once == twice
    assert all(r["checksum_ok"] for r in verify_checksums(twice))


def test_encode_avoids_excluded_punctuation():
    for v in (0, 1, 0xFFFFFFFF, 0x12345678, 0xDEADBEEF):
        s = encode_checksum(v)
        assert len(s) == 16
        assert not set(s.encode()) & set(b":;<=>?@[\\]^_`")


def test_spark_read_verifying_accepts_good_and_rejects_tampered(spark, tmp_path):
    good = add_checksums(_blob())
    (tmp_path / "good.fits").write_bytes(good)
    df = read_fits(spark, str(tmp_path / "good.fits"), hdu="CAT", verify_checksum=True)
    assert df.count() == 200

    bad = bytearray(good)
    bad[-50] ^= 0x01
    (tmp_path / "bad.fits").write_bytes(bytes(bad))
    with pytest.raises(Exception, match="checksum mismatch"):
        read_fits(
            spark, str(tmp_path / "bad.fits"), hdu="CAT", verify_checksum=True
        ).count()
