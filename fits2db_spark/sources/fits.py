"""FITS BINTABLE ingest — the reference's core capability (SURVEY.md §1.1,
§2.A fits_ingest), built Spark-first.

A pure-numpy FITS parser (FITS is a public fixed-format standard: 2880-byte
header/data blocks, 80-char header cards, big-endian fixed-width binary table
rows — no external FITS library needed or available here), wrapped in a
``binaryFile`` scan + ``mapInArrow`` decode so N FITS files decode in
parallel across executors:

    files (glob) -> spark.read.format("binaryFile") -> mapInArrow(decode)
          -> DataFrame with the schema DECLARED by the FITS header

Schema is never inferred from data — TTYPEn/TFORMn declare it (the
reference's philosophy). Type map per SURVEY.md §1.2:

    L -> boolean   X -> binary(bitfield)  B -> short (unsigned byte)
    I -> short     J -> int               K -> long
    E -> float     D -> double            A<n> -> string
    rT (repeat>1) -> array<T>

Variable-length descriptors (P/Q) and compressed HDUs are out of scope and
rejected loudly.

Scale note: one FITS file = one Arrow decode task; a 100 TB archive of FITS
files parallelizes by file (the reference processes files serially on one
node). Row decode is vectorized numpy (``np.frombuffer`` with a structured
big-endian dtype), not per-row Python.
"""

from __future__ import annotations

import io
import math
import re

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
)

BLOCK = 2880
CARD = 80

_TFORM_RE = re.compile(r"^(\d*)([LXBIJKED]|A\d*|[PQ].*)$")

# TFORM letter -> (numpy dtype char (big-endian), spark type)
_SCALAR_MAP: dict[str, tuple[str, DataType]] = {
    "L": ("S1", BooleanType()),
    "B": ("u1", ShortType()),
    "I": (">i2", ShortType()),
    "J": (">i4", IntegerType()),
    "K": (">i8", LongType()),
    "E": (">f4", FloatType()),
    "D": (">f8", DoubleType()),
}


class FitsFormatError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Header parsing
# ---------------------------------------------------------------------------

def _parse_header(buf: bytes, off: int) -> tuple[dict, int]:
    """Parse one FITS header starting at ``off``; return (cards, next_off)."""
    cards: dict[str, str] = {}
    pos = off
    while True:
        if pos + BLOCK > len(buf):
            raise FitsFormatError("truncated header block")
        block = buf[pos : pos + BLOCK]
        pos += BLOCK
        done = False
        for i in range(0, BLOCK, CARD):
            card = block[i : i + CARD].decode("ascii", errors="replace")
            key = card[:8].strip()
            if key == "END":
                done = True
                break
            if not key or key in ("COMMENT", "HISTORY"):
                continue
            if card[8:10] != "= ":
                continue
            val = card[10:].split("/")[0].strip()
            if val.startswith("'"):
                val = val[1:].split("'")[0].rstrip()
            cards[key] = val
        if done:
            return cards, pos


def _header_int(cards: dict, key: str) -> int:
    try:
        return int(cards[key])
    except KeyError as e:
        raise FitsFormatError(f"missing required card {key}") from e


def parse_bintable_header(data: bytes, hdu: int = 1) -> tuple[dict, list[dict], int]:
    """Walk HDUs to the requested extension; return (cards, columns, data_off).

    columns: [{name, tform, repeat, letter, spark_type, np_dtype}, ...]
    """
    off = 0
    cards: dict[str, str] = {}
    for idx in range(hdu + 1):
        cards, off = _parse_header(data, off)
        if idx == 0:
            # primary HDU: skip its (usually empty) data
            naxis = _header_int(cards, "NAXIS")
            size = 0
            if naxis:
                bitpix = abs(_header_int(cards, "BITPIX"))
                size = bitpix // 8
                for a in range(1, naxis + 1):
                    size *= _header_int(cards, f"NAXIS{a}")
            off += math.ceil(size / BLOCK) * BLOCK
        elif idx < hdu:
            if cards.get("XTENSION", "").startswith(("BINTABLE", "TABLE", "IMAGE")):
                size = _header_int(cards, "NAXIS1") * _header_int(cards, "NAXIS2")
                # crude: works for tables (2 axes); images would need a product
                off += math.ceil(size / BLOCK) * BLOCK
            else:
                raise FitsFormatError(f"unsupported intermediate HDU {idx}")
    if not cards.get("XTENSION", "").startswith("BINTABLE"):
        raise FitsFormatError(f"HDU {hdu} is not a BINTABLE (XTENSION={cards.get('XTENSION')!r})")

    tfields = _header_int(cards, "TFIELDS")
    cols = []
    for i in range(1, tfields + 1):
        tform = cards.get(f"TFORM{i}", "").strip()
        name = cards.get(f"TTYPE{i}", f"col{i}").strip()
        m = _TFORM_RE.match(tform)
        if not m:
            raise FitsFormatError(f"unparseable TFORM{i}={tform!r}")
        repeat = int(m.group(1)) if m.group(1) else 1
        letter = m.group(2)
        if letter[0] in ("P", "Q"):
            raise FitsFormatError("variable-length (P/Q) arrays are not supported")
        if letter[0] == "A":
            width = int(letter[1:]) if len(letter) > 1 else repeat
            # FITS 'rA' means ONE string of length r (common convention)
            cols.append(
                dict(name=name, letter="A", repeat=1, width=max(repeat, width),
                     spark_type=StringType(), np_dtype=f"S{max(repeat, width)}")
            )
            continue
        if letter == "X":
            nbytes = (repeat + 7) // 8
            cols.append(
                dict(name=name, letter="X", repeat=1, width=nbytes,
                     spark_type=BinaryType(), np_dtype=f"{nbytes}u1")
            )
            continue
        np_char, stype = _SCALAR_MAP[letter]
        if repeat > 1:
            cols.append(
                dict(name=name, letter=letter, repeat=repeat, width=None,
                     spark_type=ArrayType(stype), np_dtype=f"{repeat}{np_char}"
                     if letter != "L" else f"{repeat}S1")
            )
        else:
            cols.append(
                dict(name=name, letter=letter, repeat=1, width=None,
                     spark_type=stype, np_dtype=np_char)
            )
    return cards, cols, off


def fits_spark_schema(cols: list[dict]) -> StructType:
    return StructType([StructField(c["name"], c["spark_type"], True) for c in cols])


# ---------------------------------------------------------------------------
# Row decode (vectorized)
# ---------------------------------------------------------------------------

def decode_bintable(data: bytes, hdu: int = 1):
    """bytes -> (schema, list-of-column numpy/object arrays) for one file."""
    cards, cols, off = parse_bintable_header(data, hdu)
    nrows = _header_int(cards, "NAXIS2")
    rowbytes = _header_int(cards, "NAXIS1")
    dtype = np.dtype([(c["name"], c["np_dtype"]) for c in cols])
    if dtype.itemsize != rowbytes:
        raise FitsFormatError(
            f"row width mismatch: dtype {dtype.itemsize} vs NAXIS1 {rowbytes}"
        )
    raw = np.frombuffer(data, dtype=dtype, count=nrows, offset=off)
    out = []
    for c in cols:
        a = raw[c["name"]]
        if c["letter"] == "L":
            out.append(a == b"T")
        elif c["letter"] == "A":
            out.append(np.char.decode(np.char.rstrip(a), "ascii"))
        elif c["letter"] == "X":
            out.append([bytes(x) for x in a])
        else:
            # big-endian -> native for Arrow
            out.append(a.astype(a.dtype.newbyteorder("=")))
    return fits_spark_schema(cols), out


# ---------------------------------------------------------------------------
# Spark reader
# ---------------------------------------------------------------------------

def read_fits(spark: SparkSession, path: str, hdu: int = 1, schema: StructType | None = None) -> DataFrame:
    """Read a FITS file / glob of files into a DataFrame.

    ``schema`` may be passed to skip the driver-side header probe; otherwise
    the first file's header declares it (never inferred from row data).
    """
    import pyarrow as pa

    from ..session import ensure_runtime_confs

    ensure_runtime_confs(spark)  # ships this package to executor workers
    files = spark.read.format("binaryFile").load(path)
    if schema is None:
        first = files.select("content").limit(1).collect()
        if not first:
            raise FitsFormatError(f"no files matched {path!r}")
        s, _ = decode_bintable(bytes(first[0][0]), hdu)
        schema = s

    names = [f.name for f in schema.fields]

    def decode_files(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            for payload in tbl.column("content"):
                _, cols = decode_bintable(payload.as_py(), hdu)
                yield pa.RecordBatch.from_pydict(
                    {n: pa.array(c) for n, c in zip(names, cols)}
                )

    return files.select("content").mapInArrow(decode_files, schema=schema)


# ---------------------------------------------------------------------------
# Writer (tests + fixtures generate their own byte-level FITS files)
# ---------------------------------------------------------------------------

def _card(key: str, value, comment: str = "") -> bytes:
    if isinstance(value, bool):
        v = "T" if value else "F"
        s = f"{key:<8}= {v:>20}"
    elif isinstance(value, (int, float)):
        s = f"{key:<8}= {value:>20}"
    else:
        s = f"{key:<8}= '{value}'"
    if comment:
        s += f" / {comment}"
    return s[:CARD].ljust(CARD).encode("ascii")


def _pad(b: bytes, fill: bytes = b"\x00") -> bytes:
    rem = len(b) % BLOCK
    return b if rem == 0 else b + fill * (BLOCK - rem)


def write_fits_bintable(columns: list[tuple[str, str, list]], out: io.IOBase | None = None) -> bytes:
    """Build a single-BINTABLE FITS file.

    columns: [(name, tform, values), ...] with tform in the §1.2 set
    (e.g. 'J', 'D', 'A12', '3E', 'L', '8X').
    """
    nrows = len(columns[0][2]) if columns else 0
    hdr = b"".join(
        [
            _card("SIMPLE", True),
            _card("BITPIX", 8),
            _card("NAXIS", 0),
            _card("EXTEND", True),
            b"END".ljust(CARD),
        ]
    )
    primary = _pad(hdr, b" ")

    np_fields, encoded = [], []
    for name, tform, values in columns:
        m = _TFORM_RE.match(tform)
        if not m:
            raise FitsFormatError(f"bad tform {tform!r}")
        repeat = int(m.group(1)) if m.group(1) else 1
        letter = m.group(2)
        if letter[0] == "A":
            width = int(letter[1:]) if len(letter) > 1 else repeat
            np_fields.append((name, f"S{width}"))
            encoded.append(np.array([str(v)[:width].encode("ascii") for v in values], dtype=f"S{width}"))
        elif letter == "X":
            nbytes = (repeat + 7) // 8
            np_fields.append((name, f"{nbytes}u1"))
            encoded.append(np.array([np.frombuffer(v, dtype="u1") for v in values], dtype="u1"))
        elif letter == "L":
            np_fields.append((name, "S1"))
            encoded.append(np.array([b"T" if v else b"F" for v in values], dtype="S1"))
        else:
            np_char, _ = _SCALAR_MAP[letter]
            if repeat > 1:
                np_fields.append((name, f"{repeat}{np_char}"))
                encoded.append(np.array(values, dtype=np_char.lstrip(">")).astype(np_char))
            else:
                np_fields.append((name, np_char))
                encoded.append(np.array(values).astype(np_char))

    dtype = np.dtype(np_fields)
    rows = np.zeros(nrows, dtype=dtype)
    for (name, _), arr in zip(np_fields, encoded):
        rows[name] = arr

    cards = [
        _card("XTENSION", "BINTABLE"),
        _card("BITPIX", 8),
        _card("NAXIS", 2),
        _card("NAXIS1", dtype.itemsize),
        _card("NAXIS2", nrows),
        _card("PCOUNT", 0),
        _card("GCOUNT", 1),
        _card("TFIELDS", len(columns)),
    ]
    for i, (name, tform, _) in enumerate(columns, 1):
        cards.append(_card(f"TTYPE{i}", name))
        cards.append(_card(f"TFORM{i}", tform))
    cards.append(b"END".ljust(CARD))
    ext_hdr = _pad(b"".join(cards), b" ")

    blob = primary + ext_hdr + _pad(rows.tobytes())
    if out is not None:
        out.write(blob)
    return blob
