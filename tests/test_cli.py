"""CLI end-to-end tests (SURVEY.md §3.1): the reference is a command-line
tool — argv -> DDL emission / CSV / JDBC load. Runs the real `run()` with a
shared session (spawning a JVM per test would dominate)."""

import pytest

from fits2db_spark.cli import run
from fits2db_spark.sources.fits import write_fits_bintable


@pytest.fixture()
def fits_file(tmp_path):
    blob = write_fits_bintable(
        [
            ("id", "K", [1, 2, 3]),
            ("flux", "D", [0.5, 1.5, 2.5]),
            ("name", "A8", ["aa", "bb", "cc"]),
        ]
    )
    p = tmp_path / "cat.fits"
    p.write_bytes(blob)
    return str(p)


def test_cli_ddl_only(fits_file, tmp_path, spark, capsys):
    rc = run([fits_file, "--table", "stars", "--ddl-only", "--drop"], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert 'DROP TABLE IF EXISTS "stars";' in out
    assert 'CREATE TABLE "stars"' in out
    assert '"id" bigint' in out and '"flux" double precision' in out and '"name" text' in out


def test_cli_ddl_dialects(fits_file, spark, capsys):
    run([fits_file, "--table", "t", "--ddl-only", "--dialect", "mysql"], spark=spark)
    out = capsys.readouterr().out
    assert "CREATE TABLE `t`" in out and "`id` bigint" in out


def test_cli_csv_out(fits_file, tmp_path, spark):
    out_dir = str(tmp_path / "csv")
    rc = run(
        [fits_file, "--table", "t", "--csv-out", out_dir, "--single-file"], spark=spark
    )
    assert rc == 0
    import glob

    parts = glob.glob(f"{out_dir}/part-*.csv")
    assert len(parts) == 1
    lines = open(parts[0]).read().strip().splitlines()
    assert lines[0] == "id,flux,name"
    assert sorted(lines[1:]) == ["1,0.5,aa", "2,1.5,bb", "3,2.5,cc"]


def test_cli_jdbc_load_derby(fits_file, tmp_path, spark):
    """The full reference pipeline: FITS file -> CREATE + load -> SQL table,
    verified by reading the Derby table back through JDBC."""
    url = f"jdbc:derby:{tmp_path}/cli_db;create=true"
    rc = run(
        [
            fits_file,
            "--table", "stars",
            "--jdbc-url", url,
            "--mode", "create",
            "--num-partitions", "1",
        ],
        spark=spark,
    )
    assert rc == 0
    back = (
        spark.read.format("jdbc").option("url", url).option("dbtable", "stars").load()
    )
    rows = sorted((r.id, r.flux, r.name) for r in back.collect())
    assert rows == [(1, 0.5, "aa"), (2, 1.5, "bb"), (3, 2.5, "cc")]


def test_cli_multi_file_union(tmp_path, spark, capsys):
    for i in range(2):
        blob = write_fits_bintable([("id", "J", [i * 2, i * 2 + 1])])
        (tmp_path / f"f{i}.fits").write_bytes(blob)
    rc = run([str(tmp_path / "f0.fits"), str(tmp_path / "f1.fits"), "--table", "t"], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert "table t: 4 rows" in out


def test_cli_hdu_by_name(tmp_path, spark, capsys):
    from fits2db_spark.sources.fits import write_fits_multi

    blob = write_fits_multi(
        [
            {"columns": [("a", "J", [1])], "extname": "RAW"},
            {"columns": [("b", "J", [5, 6, 7])], "extname": "CAL"},
        ]
    )
    (tmp_path / "m.fits").write_bytes(blob)
    rc = run([str(tmp_path / "m.fits"), "--table", "t", "--hdu", "CAL"], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert "table t: 3 rows" in out and "b: int" in out


def test_cli_ascii_table_csv(tmp_path, spark):
    """--ascii reads an ASCII TABLE extension end-to-end to CSV."""
    from fits2db_spark.sources.fits import write_fits_asciitable

    blob = write_fits_asciitable(
        [("name", "A5", ["aa", "bb"]), ("val", "I4", [7, 9])], extname="CAT"
    )
    src = tmp_path / "cat.fits"
    src.write_bytes(blob)
    out = tmp_path / "csv"
    rc = run(
        [str(src), "--table", "cat", "--ascii", "--csv-out", str(out), "--single-file"],
        spark=spark,
    )
    assert rc == 0
    import glob

    [f] = glob.glob(str(out / "part-*.csv"))
    body = open(f).read().strip().splitlines()
    assert body[0].split(",")[:2] == ["name", "val"]
    assert sorted(body[1:]) == ["aa,7", "bb,9"]


def test_cli_verify_checksum_good_and_tampered(tmp_path, spark, capsys):
    from fits2db_spark.sources.fits import add_checksums

    blob = add_checksums(
        write_fits_bintable([("id", "J", [1, 2, 3]), ("v", "D", [0.5, 1.5, 2.5])])
    )
    good = tmp_path / "good.fits"
    good.write_bytes(blob)
    rc = run([str(good), "--table", "t", "--verify-checksum"], spark=spark)
    assert rc == 0
    assert "3 rows" in capsys.readouterr().out

    bad = bytearray(blob)
    bad[-50] ^= 0x01
    badf = tmp_path / "bad.fits"
    badf.write_bytes(bytes(bad))
    with pytest.raises(Exception, match="checksum mismatch"):
        run([str(badf), "--table", "t", "--verify-checksum"], spark=spark)


def test_cli_image_pixel_table_csv(tmp_path, spark):
    import numpy as np

    from fits2db_spark.sources.fits import write_fits_image

    img = (np.arange(12, dtype="i2")).reshape(3, 4)
    p = tmp_path / "img.fits"
    p.write_bytes(write_fits_image(img, bscale=2.0, extname="SCI"))
    out = tmp_path / "csv"
    rc = run(
        [str(p), "--table", "pix", "--hdu", "SCI", "--image",
         "--csv-out", str(out), "--single-file"],
        spark=spark,
    )
    assert rc == 0
    body = next(out.glob("*.csv")).read_text().strip().splitlines()
    assert body[0] == "x,y,val"
    assert len(body) == 13  # header + 12 pixels
    assert "3,2,22.0" in body  # img[2,3] = 11 -> 2*11


def test_cli_verify_checksum_composes_with_image(tmp_path, spark):
    import numpy as np

    from fits2db_spark.sources.fits import add_checksums, write_fits_image

    blob = add_checksums(
        write_fits_image(np.ones((4, 4), dtype="i2"), extname="SCI")
    )
    bad = bytearray(blob)
    bad[-30] ^= 0x01
    p = tmp_path / "bad_img.fits"
    p.write_bytes(bytes(bad))
    with pytest.raises(Exception, match="checksum mismatch"):
        run(
            [str(p), "--table", "pix", "--hdu", "SCI", "--image",
             "--verify-checksum"],
            spark=spark,
        )


def test_cli_votable_out(fits_file, tmp_path, spark):
    import xml.etree.ElementTree as ET

    out = tmp_path / "cat.vot"
    rc = run([fits_file, "--table", "stars", "--votable-out", str(out)], spark=spark)
    assert rc == 0
    root = ET.parse(out).getroot()
    ns = {"vo": "http://www.ivoa.net/xml/VOTable/v1.3"}
    assert root.find(".//vo:TABLE", ns).get("name") == "stars"
    assert len(root.findall(".//vo:TR", ns)) == 3


def test_cli_rejects_nonpositive_votable_limit(capsys):
    """r8 ADVICE: --votable-limit must be >= 1 (argparse-level rejection)."""
    import pytest

    from fits2db_spark.cli import build_parser

    p = build_parser()
    for bad in ("0", "-3"):
        with pytest.raises(SystemExit):
            p.parse_args(["x.fits", "--table", "t", "--votable-limit", bad])
    assert "must be >= 1" in capsys.readouterr().err


def test_scaleup_bench_surfaces_subprocess_failures(monkeypatch):
    """r8 ADVICE: run_benches must raise with the subprocess stderr instead
    of dying on an IndexError when a bench crashes or prints no JSON."""
    import subprocess
    import types

    import pytest

    import tools.scaleup_bench as sb

    def fake_run_rc1(cmd, **kw):
        return types.SimpleNamespace(returncode=1, stdout="", stderr="boom-trace")

    monkeypatch.setattr(subprocess, "run", fake_run_rc1)
    with pytest.raises(RuntimeError, match="boom-trace"):
        sb.run_benches()

    def fake_run_nojson(cmd, **kw):
        return types.SimpleNamespace(returncode=0, stdout="no json here\n", stderr="")

    monkeypatch.setattr(subprocess, "run", fake_run_nojson)
    with pytest.raises(RuntimeError, match="no JSON line"):
        sb.run_benches()


def test_cli_parquet_out_with_partitioning(fits_file, tmp_path, spark):
    """r8: the lakehouse landing sink — parquet output with hive-layout
    directory partitioning, read back losslessly with pruning-capable
    col=value subdirs."""
    out = str(tmp_path / "pq")
    rc = run(
        [fits_file, "--table", "t", "--parquet-out", out, "--partition-by", "name"]
    )
    assert rc == 0
    import os

    subdirs = {d for d in os.listdir(out) if d.startswith("name=")}
    assert subdirs == {"name=aa", "name=bb", "name=cc"}
    back = spark.read.parquet(out)
    rows = {(r["id"], r["flux"], r["name"]) for r in back.collect()}
    assert rows == {(1, 0.5, "aa"), (2, 1.5, "bb"), (3, 2.5, "cc")}
