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
    C -> struct<re:float,im:float>        M -> struct<re:double,im:double>
    rT (repeat>1) -> array<T>

Variable-length array columns (``PT(max)`` 32-bit / ``QT(max)`` 64-bit
descriptors into the heap) decode to ``ArrayType`` columns. Tile-compressed
(fpack'd) BINTABLEs — ``ZTABLE = T`` with per-column RICE_1 / GZIP_1 /
NOCOMPRESS streams — decode transparently via ``fits_compress`` (both the
whole-file and the row-range paths; ranged reads touch only overlapped
tiles).

Scale note: one FITS file = one Arrow decode task; a 100 TB archive of FITS
files parallelizes by file (the reference processes files serially on one
node). Row decode is vectorized numpy (``np.frombuffer`` with a structured
big-endian dtype), not per-row Python.
"""

from __future__ import annotations

import io
import math
import os
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

_TFORM_RE = re.compile(r"^(\d*)([LXBIJKEDCM]|A\d*|[PQ].*)$")


def _complex_struct(t: DataType) -> StructType:
    """SURVEY.md §1.2: FITS complex (C = 2xfloat32, M = 2xfloat64) maps to
    struct<re,im> — SQL has no complex scalar, and a struct keeps the pair
    queryable (col.re / col.im) without the lossy split into two columns."""
    return StructType([StructField("re", t, True), StructField("im", t, True)])


# TFORM letter -> (numpy dtype char (big-endian), spark type)
_SCALAR_MAP: dict[str, tuple[str, DataType]] = {
    "L": ("S1", BooleanType()),
    "B": ("u1", ShortType()),
    "I": (">i2", ShortType()),
    "J": (">i4", IntegerType()),
    "K": (">i8", LongType()),
    "E": (">f4", FloatType()),
    "D": (">f8", DoubleType()),
    "C": (">c8", _complex_struct(FloatType())),
    "M": (">c16", _complex_struct(DoubleType())),
}


class FitsFormatError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Header parsing
# ---------------------------------------------------------------------------

def _card_value(raw: str) -> str:
    """Value field of one header card (text after ``= ``).

    Quoted strings are scanned to their CLOSING quote first — honoring the
    FITS ``''`` escape — before the ``/ comment`` separator is considered:
    a ``/`` inside a quoted value (common in unit/name strings like
    'erg/s/cm^2') is part of the value, not a comment marker."""
    s = raw.strip()
    if not s.startswith("'"):
        return s.split("/")[0].strip()
    # scan for the closing quote; '' is an escaped literal quote
    out = []
    i = 1
    while i < len(s):
        ch = s[i]
        if ch == "'":
            if i + 1 < len(s) and s[i + 1] == "'":
                out.append("'")
                i += 2
                continue
            break  # closing quote — anything after (incl. /comment) ignored
        out.append(ch)
        i += 1
    return "".join(out).rstrip()


def _parse_header_blocks(next_block) -> dict:
    """Parse one FITS header from a callable yielding 2880-byte blocks."""
    cards: dict[str, str] = {}
    while True:
        block = next_block()
        if len(block) < BLOCK:
            raise FitsFormatError("truncated header block")
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
            cards[key] = _card_value(card[10:])
        if done:
            return cards


def _parse_header(buf: bytes, off: int) -> tuple[dict, int]:
    """Parse one FITS header starting at ``off``; return (cards, next_off)."""
    pos = off

    def next_block() -> bytes:
        nonlocal pos
        block = buf[pos : pos + BLOCK]
        pos += BLOCK
        return block

    cards = _parse_header_blocks(next_block)
    return cards, pos


def _header_int(cards: dict, key: str) -> int:
    try:
        return int(cards[key])
    except KeyError as e:
        raise FitsFormatError(f"missing required card {key}") from e
    except ValueError as e:
        # a garbled numeric value (e.g. a corrupted byte in the card) is a
        # format error, not a programming error — callers rely on the typed
        # exception to distinguish "corrupt file" from a bug
        raise FitsFormatError(f"malformed integer card {key}={cards[key]!r}") from e


def _hdu_data_size(cards: dict) -> int:
    """Data-area byte count of one HDU per the FITS standard formula:
    ``(|BITPIX|/8) * GCOUNT * (PCOUNT + NAXIS1*...*NAXISn)`` — covering
    empty primaries, IMAGE extensions (BITPIX/8 factor and all axes), and
    BINTABLE/TABLE heaps (PCOUNT). The round-1 advisory found the previous
    table-only NAXIS1*NAXIS2 shortcut seeks to the wrong offset on files
    with a non-empty heap or image extensions."""
    naxis = _header_int(cards, "NAXIS")
    if naxis == 0:
        return 0
    axes = 1
    for a in range(1, naxis + 1):
        axes *= _header_int(cards, f"NAXIS{a}")
    bitpix = abs(_header_int(cards, "BITPIX"))
    gcount = _header_int(cards, "GCOUNT") if "GCOUNT" in cards else 1
    pcount = _header_int(cards, "PCOUNT") if "PCOUNT" in cards else 0
    return (bitpix // 8) * gcount * (pcount + axes)


def parse_bintable_header(data: bytes, hdu: int | str = 1) -> tuple[dict, list[dict], int]:
    """Walk HDUs to the requested extension; return (cards, columns, data_off).

    ``hdu`` selects the extension by 1-based index (0 = primary is never a
    BINTABLE) or by ``EXTNAME`` string (case-insensitive, per convention).

    columns: [{name, tform, repeat, letter, spark_type, np_dtype,
               tnull, tscale, tzero}, ...]
    """
    off = 0
    cards: dict[str, str] = {}
    found = False
    idx = 0
    while off < len(data):
        cards, off = _parse_header(data, off)
        if isinstance(hdu, str):
            if (
                idx > 0
                and cards.get("XTENSION", "").startswith("BINTABLE")
                and cards.get("EXTNAME", "").strip().upper() == hdu.strip().upper()
            ):
                found = True
                break
        elif idx == hdu:
            found = True
            break
        off += math.ceil(_hdu_data_size(cards) / BLOCK) * BLOCK
        idx += 1
    if not found:
        raise FitsFormatError(f"HDU {hdu!r} not found")
    if not cards.get("XTENSION", "").startswith("BINTABLE"):
        raise FitsFormatError(f"HDU {hdu} is not a BINTABLE (XTENSION={cards.get('XTENSION')!r})")
    return cards, _parse_columns(cards), off


def parse_bintable_header_path(path: str, hdu: int | str = 1) -> tuple[dict, list[dict], int]:
    """Header-only probe of a FITS file on disk: walk HDUs with seeks,
    reading ONLY header blocks (never data) — O(headers) I/O however large
    the file. This is what lets the data source plan row-range partitions
    for a multi-GB BINTABLE without touching its payload."""
    with open(path, "rb") as f:
        off = 0
        idx = 0
        while True:
            f.seek(off)
            try:
                cards = _parse_header_blocks(lambda: f.read(BLOCK))
            except FitsFormatError:
                raise FitsFormatError(f"HDU {hdu!r} not found") from None
            hdr_end = f.tell()
            if isinstance(hdu, str):
                if (
                    idx > 0
                    and cards.get("XTENSION", "").startswith("BINTABLE")
                    and cards.get("EXTNAME", "").strip().upper() == hdu.strip().upper()
                ):
                    break
            elif idx == hdu:
                break
            off = hdr_end + math.ceil(_hdu_data_size(cards) / BLOCK) * BLOCK
            idx += 1
    if not cards.get("XTENSION", "").startswith("BINTABLE"):
        raise FitsFormatError(f"HDU {hdu} is not a BINTABLE (XTENSION={cards.get('XTENSION')!r})")
    return cards, _parse_columns(cards), hdr_end


def _parse_columns(cards: dict) -> list[dict]:
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
            # variable-length array: the row stores a (count, heap-offset)
            # descriptor — 2x int32 for P, 2x int64 for Q; elements live in
            # the heap after the fixed-width rows (THEAP/PCOUNT)
            elem = letter[1] if len(letter) > 1 else ""
            if elem not in _SCALAR_MAP or elem in "CM":
                raise FitsFormatError(
                    f"variable-length element type {elem!r} not supported (TFORM{i}={tform!r})"
                )
            np_char, stype = _SCALAR_MAP[elem]
            desc = ">i4" if letter[0] == "P" else ">i8"
            cols.append(
                dict(name=name, letter=letter[0], repeat=1, width=None,
                     spark_type=ArrayType(ShortType() if elem == "B" else stype),
                     np_dtype=f"2{desc}", vla_elem=elem, vla_np=np_char,
                     tnull=None, kind="raw", tscale=1.0, tzero=0.0)
            )
            continue
        if letter[0] == "A":
            width = int(letter[1:]) if len(letter) > 1 else repeat
            # FITS 'rA' means ONE string of length r (common convention)
            cols.append(
                dict(name=name, letter="A", repeat=1, width=max(repeat, width),
                     spark_type=StringType(), np_dtype=f"S{max(repeat, width)}",
                     tnull=None, kind="raw", tscale=1.0, tzero=0.0)
            )
            continue
        if letter == "X":
            nbytes = (repeat + 7) // 8
            cols.append(
                dict(name=name, letter="X", repeat=1, width=nbytes,
                     spark_type=BinaryType(), np_dtype=f"{nbytes}u1",
                     tnull=None, kind="raw", tscale=1.0, tzero=0.0)
            )
            continue
        np_char, stype = _SCALAR_MAP[letter]
        # TNULLn: integer sentinel -> SQL NULL (FITS has no native numeric
        # null — SURVEY.md §1.1); TSCALn/TZEROn: physical = zero + scale*raw
        tnull = int(cards[f"TNULL{i}"]) if f"TNULL{i}" in cards and letter in "BIJK" else None
        tscale = float(cards.get(f"TSCAL{i}", 1.0))
        tzero = float(cards.get(f"TZERO{i}", 0.0))
        stype, kind = _physical_type(letter, stype, tscale, tzero)
        if repeat > 1:
            cols.append(
                dict(name=name, letter=letter, repeat=repeat, width=None,
                     spark_type=ArrayType(stype), np_dtype=f"{repeat}{np_char}"
                     if letter != "L" else f"{repeat}S1",
                     tnull=tnull, kind=kind, tscale=tscale, tzero=tzero)
            )
        else:
            cols.append(
                dict(name=name, letter=letter, repeat=1, width=None,
                     spark_type=stype, np_dtype=np_char,
                     tnull=tnull, kind=kind, tscale=tscale, tzero=tzero)
            )
    # Optional per-column conventions (FITS 4.0 §7.3.2): TUNITn physical
    # unit and TDISPn display format ride along as Spark column METADATA —
    # they never change decoded values, but sinks (VOTable unit attr) and
    # format_tdisp() consume them downstream.
    for i, c in enumerate(cols, start=1):
        c["unit"] = cards.get(f"TUNIT{i}", "").strip() or None
        c["disp"] = cards.get(f"TDISP{i}", "").strip() or None
    return cols


def _physical_type(letter: str, stype: DataType, tscale: float, tzero: float):
    """Physical (post TSCAL/TZERO) Spark type + decode kind.

    The integer-offset conventions (the FITS way of storing unsigned ints:
    ``I`` + TZERO=32768 = uint16, ``J`` + TZERO=2^31 = uint32, ``B`` +
    TZERO=-128 = signed byte) stay integral with a widened type; any other
    scaling produces DOUBLE. ``K`` with an offset would need uint64 — no
    Spark type holds it, so it is rejected loudly rather than silently
    wrapped."""
    if tscale == 1.0 and tzero == 0.0:
        return stype, "raw"
    if letter in "CM":
        raise FitsFormatError("TSCAL/TZERO on complex (C/M) columns is not supported")
    if letter in "BIJK" and tscale == 1.0 and float(tzero).is_integer():
        if letter == "K":
            raise FitsFormatError("K with TZERO offset (uint64) is not representable")
        promoted = {"B": ShortType(), "I": IntegerType(), "J": LongType()}[letter]
        return promoted, "int_offset"
    if letter == "L":
        return stype, "raw"
    return DoubleType(), "float_scale"


def _field_metadata(c: dict) -> dict:
    """TUNITn/TDISPn as Spark StructField metadata keys (absent if the
    header never declared them)."""
    md = {}
    if c.get("unit"):
        md["fits.tunit"] = c["unit"]
    if c.get("disp"):
        md["fits.tdisp"] = c["disp"]
    return md


def fits_spark_schema(cols: list[dict]) -> StructType:
    return StructType(
        [
            StructField(c["name"], c["spark_type"], True, metadata=_field_metadata(c))
            for c in cols
        ]
    )


_TDISP_RE = re.compile(r"^([AILFEDG])(?:N|S)?(\d+)?(?:\.(\d+))?", re.IGNORECASE)


def format_tdisp(col, tdisp: str):
    """Render a column as its FITS TDISPn display string (FITS 4.0 table
    8.6 subset): ``Iw`` right-justified integer, ``Fw.d`` fixed point,
    ``Ew.d``/``Dw.d``/``Gw.d`` scientific, ``Aw`` left-justified string;
    anything else falls back to a plain string cast. Pure Catalyst
    (format_string), so a TDISP-faithful CSV/VOTable export stays one
    codegen'd projection at any scale."""
    from pyspark.sql import functions as F

    m = _TDISP_RE.match(tdisp.strip()) if tdisp else None
    if not m:
        return F.col(col).cast("string") if isinstance(col, str) else col.cast("string")
    c = F.col(col) if isinstance(col, str) else col
    letter = m.group(1).upper()
    w = int(m.group(2)) if m.group(2) else 0
    d = int(m.group(3)) if m.group(3) is not None else 6
    if letter == "I":
        return F.format_string(f"%{w}d" if w else "%d", c.cast("long"))
    if letter == "F":
        return F.format_string(f"%{w}.{d}f" if w else f"%.{d}f", c.cast("double"))
    if letter in ("E", "D", "G"):
        return F.format_string(f"%{w}.{d}E" if w else f"%.{d}E", c.cast("double"))
    if letter == "A":
        # FITS character data is left-justified within the field width
        return F.format_string(f"%-{w}s" if w else "%s", c.cast("string"))
    return c.cast("string")


# ---------------------------------------------------------------------------
# Row decode (vectorized)
# ---------------------------------------------------------------------------

_NP_TARGET = {ShortType: "i2", IntegerType: "i4", LongType: "i8"}


def decode_bintable(data: bytes, hdu: int | str = 1):
    """bytes -> (schema, list-of-column numpy/object arrays) for one file.

    Column arrays are 1D for scalar columns, 2D (nrows x repeat) for
    repeat>1 columns, and ``np.ma.MaskedArray`` where a TNULLn sentinel
    declares nulls — :func:`to_arrow_columns` turns all three into Arrow
    arrays (list-typed for 2D, null-bearing for masked)."""
    cards, cols, off = parse_bintable_header(data, hdu)
    if cards.get("ZTABLE", "").strip() == "T":
        from .fits_compress import decode_compressed_bintable

        return decode_compressed_bintable(data, cards, cols, off)
    nrows = _header_int(cards, "NAXIS2")
    rowbytes = _header_int(cards, "NAXIS1")
    dtype = np.dtype([(c["name"], c["np_dtype"]) for c in cols])
    if dtype.itemsize != rowbytes:
        raise FitsFormatError(
            f"row width mismatch: dtype {dtype.itemsize} vs NAXIS1 {rowbytes}"
        )
    raw = np.frombuffer(data, dtype=dtype, count=nrows, offset=off)
    # heap (variable-length array storage) starts THEAP bytes into the data
    # area; default THEAP = the fixed-width row block
    heap0 = off + int(cards.get("THEAP", rowbytes * nrows))
    out = _decode_columns(cols, raw, memoryview(data)[heap0:])
    return fits_spark_schema(cols), out


def decode_bintable_range(
    path: str, hdu: int | str = 1, row_start: int = 0, row_count: int | None = None
):
    """Decode ONLY rows [row_start, row_start+row_count) of a BINTABLE on
    disk — the partitioned-read primitive: fixed-width rows make the byte
    range exact (data_off + row_start*NAXIS1), so a 100 GB table splits into
    independent seek+read chunks with no coordination. Variable-length (P/Q)
    columns additionally read the heap region once per chunk (descriptor
    offsets are heap-relative, so any row subset resolves against it)."""
    cards, cols, off = parse_bintable_header_path(path, hdu)
    if cards.get("ZTABLE", "").strip() == "T":
        from .fits_compress import decode_compressed_range

        return decode_compressed_range(path, cards, cols, off, row_start, row_count)
    nrows = _header_int(cards, "NAXIS2")
    rowbytes = _header_int(cards, "NAXIS1")
    start = min(max(row_start, 0), nrows)
    cnt = nrows - start if row_count is None else max(0, min(row_count, nrows - start))
    dtype = np.dtype([(c["name"], c["np_dtype"]) for c in cols])
    if dtype.itemsize != rowbytes:
        raise FitsFormatError(
            f"row width mismatch: dtype {dtype.itemsize} vs NAXIS1 {rowbytes}"
        )
    heap_buf = b""
    with open(path, "rb") as f:
        f.seek(off + start * rowbytes)
        raw = np.frombuffer(f.read(cnt * rowbytes), dtype=dtype, count=cnt)
        if any(c["letter"] in ("P", "Q") for c in cols):
            theap = int(cards.get("THEAP", rowbytes * nrows))
            pcount = int(cards.get("PCOUNT", 0))
            # heap spans [data_off+THEAP, data_off + NAXIS1*NAXIS2 + PCOUNT)
            f.seek(off + theap)
            heap_buf = f.read(rowbytes * nrows + pcount - theap)
    return fits_spark_schema(cols), _decode_columns(cols, raw, heap_buf)


def _decode_columns(cols: list[dict], raw: np.ndarray, heap_buf) -> list:
    """Shared fixed-row decode: ``raw`` is the structured row array, and
    ``heap_buf`` the heap region (offsets in P/Q descriptors are relative
    to its start)."""
    out = []
    for c in cols:
        a = raw[c["name"]]
        if c["letter"] in ("P", "Q"):
            desc = a.astype(a.dtype.newbyteorder("="))  # (nrows, 2): count, offset
            elem = c["vla_elem"]
            elem_dt = np.dtype(c["vla_np"])
            rows = []
            for cnt, o in desc:
                v = np.frombuffer(heap_buf, dtype=elem_dt, count=int(cnt), offset=int(o))
                if elem == "L":
                    v = v == b"T"
                elif elem == "B":
                    v = v.astype("i2")
                else:
                    v = v.astype(elem_dt.newbyteorder("="))
                rows.append(v)
            out.append(rows)
            continue
        if c["letter"] == "L":
            out.append(a == b"T")
        elif c["letter"] == "A":
            out.append(np.char.decode(np.char.rstrip(a), "ascii"))
        elif c["letter"] == "X":
            out.append([bytes(x) for x in a])
        else:
            native = a.astype(a.dtype.newbyteorder("="))
            # TNULL mask is evaluated on RAW stored values, before scaling
            mask = (native == c["tnull"]) if c["tnull"] is not None else None
            if c["kind"] == "int_offset":
                elem = c["spark_type"].elementType if c["repeat"] > 1 else c["spark_type"]
                native = (native.astype("i8") + int(c["tzero"])).astype(
                    _NP_TARGET[type(elem)]
                )
            elif c["kind"] == "float_scale":
                native = native.astype("f8") * c["tscale"] + c["tzero"]
            elif c["letter"] == "B":
                # unsigned byte: Spark has no u1; widen to int16 (Arrow would
                # otherwise hand Spark an unsupported uint8 array)
                native = native.astype("i2")
            if mask is not None:
                native = np.ma.MaskedArray(native, mask=mask)
            out.append(native)
    return out


def to_arrow_columns(schema: StructType, out: list):
    """Decoded numpy columns -> pyarrow arrays matching the Spark schema.

    Handles the two shapes plain ``pa.array`` rejects: 2D repeat-count
    arrays become ListArrays (vectorized offsets, no per-row Python), and
    masked arrays carry their TNULL nulls into Arrow validity bitmaps."""
    import pyarrow as pa

    def _plain(flat: np.ndarray) -> "pa.Array":
        # complex (FITS C/M) -> struct<re,im>; Arrow has no complex type
        if np.issubdtype(flat.dtype, np.complexfloating):
            return pa.StructArray.from_arrays(
                [pa.array(np.ascontiguousarray(flat.real)),
                 pa.array(np.ascontiguousarray(flat.imag))],
                ["re", "im"],
            )
        return pa.array(flat)

    arrs = []
    for field, a in zip(schema.fields, out):
        if isinstance(a, np.ndarray) and a.ndim == 2:
            n, r = a.shape
            if isinstance(a, np.ma.MaskedArray):
                flat = pa.array(a.data.ravel(), mask=a.mask.ravel())
            else:
                flat = _plain(a.ravel())
            offsets = pa.array(np.arange(n + 1, dtype="i4") * r)
            arrs.append(pa.ListArray.from_arrays(offsets, flat))
        elif isinstance(a, np.ma.MaskedArray):
            arrs.append(pa.array(a.data, mask=np.ma.getmaskarray(a)))
        elif isinstance(a, np.ndarray):
            arrs.append(_plain(a))
        else:
            arrs.append(pa.array(a))
    return arrs


# ---------------------------------------------------------------------------
# Spark reader
# ---------------------------------------------------------------------------

def read_fits(
    spark: SparkSession,
    path: str,
    hdu: int | str = 1,
    schema: StructType | None = None,
    verify_checksum: bool = False,
) -> DataFrame:
    """Read a FITS file / glob of files into a DataFrame.

    ``hdu`` selects the BINTABLE extension by 1-based index or EXTNAME.
    ``schema`` may be passed to skip the driver-side header probe; otherwise
    the first file's header declares it (never inferred from row data).
    ``verify_checksum=True`` validates the public CHECKSUM/DATASUM
    convention on every HDU of every file, executor-side before decode,
    and fails the job on the first corrupt HDU (files without the
    keywords pass — unprotected is not corrupt).
    """
    return _read_fits_with(
        spark, path, hdu, schema, _maybe_verifying(decode_bintable, verify_checksum)
    )


def _maybe_verifying(decoder, verify: bool):
    """Wrap any (bytes, hdu) -> (schema, cols) decoder with executor-side
    CHECKSUM/DATASUM validation — HDUs of every kind (BINTABLE, TABLE,
    IMAGE) are covered because :func:`verify_checksums` walks the whole
    file. Shared by all three readers so the flag composes identically."""
    if not verify:
        return decoder

    def verifying(data: bytes, h: int | str = 1):
        for r in verify_checksums(data):
            if r["datasum_ok"] is False or r["checksum_ok"] is False:
                raise FitsFormatError(
                    f"FITS checksum mismatch in HDU {r['hdu']}"
                    f" (extname={r['extname']!r})"
                )
        return decoder(data, h)

    return verifying


def read_fits_ascii(
    spark: SparkSession,
    path: str,
    hdu: int | str = 1,
    schema: StructType | None = None,
    verify_checksum: bool = False,
) -> DataFrame:
    """Read ASCII TABLE extension(s) into a DataFrame (same per-file
    parallel decode as :func:`read_fits`, using :func:`decode_asciitable`;
    ``verify_checksum`` behaves exactly as in :func:`read_fits`)."""
    return _read_fits_with(
        spark, path, hdu, schema, _maybe_verifying(decode_asciitable, verify_checksum)
    )


def _read_fits_with(spark, path, hdu, schema, decoder) -> DataFrame:
    import pyarrow as pa

    from ..session import ensure_runtime_confs

    ensure_runtime_confs(spark)  # ships this package to executor workers
    files = spark.read.format("binaryFile").load(path)
    if schema is None:
        first = files.select("content").limit(1).collect()
        if not first:
            raise FitsFormatError(f"no files matched {path!r}")
        s, _ = decoder(bytes(first[0][0]), hdu)
        schema = s

    names = [f.name for f in schema.fields]

    def decode_files(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            for payload in tbl.column("content"):
                s, cols = decoder(payload.as_py(), hdu)
                yield pa.RecordBatch.from_arrays(to_arrow_columns(s, cols), names=names)

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


def _primary_hdu() -> bytes:
    hdr = b"".join(
        [
            _card("SIMPLE", True),
            _card("BITPIX", 8),
            _card("NAXIS", 0),
            _card("EXTEND", True),
            b"END".ljust(CARD),
        ]
    )
    return _pad(hdr, b" ")


def write_fits_bintable(
    columns: list[tuple[str, str, list]],
    out: io.IOBase | None = None,
    extname: str | None = None,
    extra_cards: list[tuple[str, object]] | None = None,
) -> bytes:
    """Build a single-BINTABLE FITS file.

    columns: [(name, tform, values), ...] with tform in the §1.2 set
    (e.g. 'J', 'D', 'A12', '3E', 'L', '8X'). ``extra_cards`` appends raw
    header cards (TNULLn / TSCALn / TZEROn in tests); ``extname`` sets
    EXTNAME for by-name HDU selection.
    """
    blob = _primary_hdu() + _bintable_ext(columns, extname, extra_cards)
    if out is not None:
        out.write(blob)
    return blob


def write_fits_multi(
    hdus: list[dict],
    out: io.IOBase | None = None,
) -> bytes:
    """Build a multi-extension FITS file: primary + one BINTABLE per entry.

    hdus: [{"columns": [...], "extname": str|None, "extra_cards": [...]}]
    """
    blob = _primary_hdu() + b"".join(
        _bintable_ext(h["columns"], h.get("extname"), h.get("extra_cards"), h.get("heap", b""))
        for h in hdus
    )
    if out is not None:
        out.write(blob)
    return blob


def write_fits_dataset(
    df: DataFrame,
    out_dir: str,
    tforms: dict[str, str],
    extname: str | None = None,
    extra_cards: list[tuple[str, object]] | None = None,
    tnulls: dict[str, int] | None = None,
) -> int:
    """Distributed FITS BINTABLE write: one file per input partition.

    The inverse of :func:`read_fits`, shaped like a Spark sink: each
    partition's Arrow batches are encoded executor-side into one
    ``part-{pid:05d}.fits`` (primary HDU + a single BINTABLE extension via
    :func:`write_fits_multi`), so an N-partition DataFrame writes N files
    in parallel — the layout :func:`read_fits`'s glob scan parallelizes
    over on the way back in. ``tforms`` maps every column to its TFORMn;
    ``tnulls`` maps integer columns to a TNULLn sentinel — SQL NULLs are
    substituted on write and the TNULLn card is emitted automatically, so
    a null-bearing DataFrame round-trips its nulls. ``extra_cards`` ride
    along on every extension (TSCALn/TZEROn/TUNITn/TDISPn conventions).

    Returns the total row count written (summed from one summary row per
    partition — the only thing that reaches the driver). Scale: like any
    file sink, ``out_dir`` must be storage all executors can reach; encode
    is vectorized numpy per partition, no per-row Python."""
    import pyarrow as pa

    from ..session import ensure_runtime_confs

    spark = df.sparkSession
    ensure_runtime_confs(spark)  # ships this package to executor workers
    os.makedirs(out_dir, exist_ok=True)
    names = [f.name for f in df.schema.fields]
    missing = [n for n in names if n not in tforms]
    if missing:
        raise FitsFormatError(f"no TFORM given for columns {missing}")
    cards = list(extra_cards or [])
    for i, n in enumerate(names, start=1):
        if tnulls and n in tnulls:
            cards.append((f"TNULL{i}", int(tnulls[n])))
    col_tforms = [tforms[n] for n in names]
    sentinels = {n: int(tnulls[n]) for n in (tnulls or {})}

    def encode_partition(batches):
        from pyspark import TaskContext

        got = list(batches)
        if not got:
            return
        tbl = pa.Table.from_batches(got)
        columns = []
        for name, tform in zip(names, col_tforms):
            values = tbl.column(name).to_pylist()
            if name in sentinels:
                s = sentinels[name]
                values = [s if v is None else v for v in values]
            columns.append((name, tform, values))
        ctx = TaskContext.get()
        pid = ctx.partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.fits")
        blob = write_fits_multi(
            [{"columns": columns, "extname": extname, "extra_cards": cards}]
        )
        # Task-commit protocol (ADVICE r13): write to an attempt-unique temp
        # name, then os.rename into place — atomic on the same filesystem —
        # so a retried or speculative duplicate attempt never interleaves
        # writes on the final path, and a killed task leaves only a
        # dot-prefixed temp that Spark's file index treats as hidden (the
        # same convention that hides _SUCCESS/_temporary), never a
        # truncated part file.
        tmp = os.path.join(
            out_dir, f".part-{pid:05d}.attempt-{ctx.taskAttemptId()}.tmp"
        )
        with open(tmp, "wb") as f:
            f.write(blob)
        os.rename(tmp, path)
        yield pa.RecordBatch.from_arrays(
            [pa.array([path]), pa.array([tbl.num_rows], type=pa.int64())],
            names=["path", "nrows"],
        )

    summary = df.mapInArrow(
        encode_partition, schema="path string, nrows long"
    ).collect()  # bounded: one row per partition
    return sum(r.nrows for r in summary)


def _bintable_ext(
    columns: list[tuple[str, str, list]],
    extname: str | None = None,
    extra_cards: list[tuple[str, object]] | None = None,
    heap: bytes = b"",
) -> bytes:
    nrows = len(columns[0][2]) if columns else 0
    np_fields, encoded = [], []
    vla_heap = bytearray()
    for name, tform, values in columns:
        m = _TFORM_RE.match(tform)
        if not m:
            raise FitsFormatError(f"bad tform {tform!r}")
        repeat = int(m.group(1)) if m.group(1) else 1
        letter = m.group(2)
        if letter[0] in ("P", "Q"):
            elem = letter[1]
            desc_dt = ">i4" if letter[0] == "P" else ">i8"
            np_fields.append((name, f"2{desc_dt}"))
            descs = np.zeros((nrows, 2), dtype=desc_dt)
            for r, vals in enumerate(values):
                if elem == "L":
                    enc = np.array([b"T" if v else b"F" for v in vals], dtype="S1")
                else:
                    np_char, _ = _SCALAR_MAP[elem]
                    enc = np.array(vals).astype(np_char)
                descs[r] = (len(vals), len(vla_heap))
                vla_heap += enc.tobytes()
            encoded.append(descs)
        elif letter[0] == "A":
            width = int(letter[1:]) if len(letter) > 1 else repeat
            np_fields.append((name, f"S{width}"))
            encoded.append(np.array([str(v)[:width].encode("ascii") for v in values], dtype=f"S{width}"))
        elif letter == "X":
            nbytes = (repeat + 7) // 8
            np_fields.append((name, f"{nbytes}u1"))
            encoded.append(np.array([np.frombuffer(v, dtype="u1") for v in values], dtype="u1"))
        elif letter == "L":
            if repeat > 1:
                np_fields.append((name, f"{repeat}S1"))
                encoded.append(
                    np.array(
                        [[b"T" if v else b"F" for v in row] for row in values], dtype="S1"
                    )
                )
            else:
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
        _card("PCOUNT", len(vla_heap) + len(heap)),
        _card("GCOUNT", 1),
        _card("TFIELDS", len(columns)),
    ]
    for i, (name, tform, _) in enumerate(columns, 1):
        cards.append(_card(f"TTYPE{i}", name))
        cards.append(_card(f"TFORM{i}", tform))
    if extname is not None:
        cards.append(_card("EXTNAME", extname))
    for key, value in extra_cards or []:
        cards.append(_card(key, value))
    cards.append(b"END".ljust(CARD))
    ext_hdr = _pad(b"".join(cards), b" ")
    return ext_hdr + _pad(rows.tobytes() + bytes(vla_heap) + heap)


# ---------------------------------------------------------------------------
# ASCII TABLE extensions (XTENSION = 'TABLE')
# ---------------------------------------------------------------------------

_ASCII_TFORM_RE = re.compile(r"^([AIFED])(\d+)(?:\.(\d+))?$")


def parse_asciitable_header(data: bytes, hdu: int | str = 1) -> tuple[dict, list[dict], int]:
    """Walk HDUs to an ASCII TABLE extension; return (cards, columns, data_off).

    ASCII tables (the older FITS table flavor, still common for small
    catalogs) store each row as NAXIS1 characters; TBCOLn gives the 1-based
    start column, TFORMn one of Aw / Iw / Fw.d / Ew.d / Dw.d. TNULLn is a
    literal string that marks a null field; TSCALn/TZEROn scale numerics
    exactly as in binary tables."""
    off = 0
    cards: dict[str, str] = {}
    found = False
    idx = 0
    while off < len(data):
        cards, off = _parse_header(data, off)
        if isinstance(hdu, str):
            if (
                idx > 0
                and cards.get("XTENSION", "").startswith("TABLE")
                and cards.get("EXTNAME", "").strip().upper() == hdu.strip().upper()
            ):
                found = True
                break
        elif idx == hdu:
            found = True
            break
        off += math.ceil(_hdu_data_size(cards) / BLOCK) * BLOCK
        idx += 1
    if not found:
        raise FitsFormatError(f"HDU {hdu!r} not found")
    if not cards.get("XTENSION", "").startswith("TABLE"):
        raise FitsFormatError(
            f"HDU {hdu} is not an ASCII TABLE (XTENSION={cards.get('XTENSION')!r})"
        )
    tfields = _header_int(cards, "TFIELDS")
    cols = []
    for i in range(1, tfields + 1):
        tform = cards.get(f"TFORM{i}", "").strip()
        m = _ASCII_TFORM_RE.match(tform)
        if not m:
            raise FitsFormatError(f"unparseable ASCII TFORM{i}={tform!r}")
        letter, width = m.group(1), int(m.group(2))
        stype = {"A": StringType(), "I": LongType()}.get(letter, DoubleType())
        tscale = float(cards.get(f"TSCAL{i}", 1.0))
        tzero = float(cards.get(f"TZERO{i}", 0.0))
        if letter != "A" and (tscale != 1.0 or tzero != 0.0):
            stype = DoubleType()
        cols.append(
            dict(
                name=cards.get(f"TTYPE{i}", f"col{i}").strip(),
                letter=letter,
                width=width,
                tbcol=_header_int(cards, f"TBCOL{i}"),
                spark_type=stype,
                tnull=cards.get(f"TNULL{i}", None),
                tscale=tscale,
                tzero=tzero,
                unit=cards.get(f"TUNIT{i}", "").strip() or None,
                disp=cards.get(f"TDISP{i}", "").strip() or None,
            )
        )
    return cards, cols, off


def decode_asciitable(data: bytes, hdu: int | str = 1):
    """bytes -> (schema, columns) for one ASCII TABLE HDU.

    Vectorized: a structured dtype with explicit field OFFSETS (TBCOLn-1)
    slices every field of every row in one frombuffer — no per-row Python.
    Null fields (blank or == the TNULLn string) become masked entries;
    Fortran 'D' exponents are folded to 'E' before float conversion."""
    cards, cols, off = parse_asciitable_header(data, hdu)
    nrows = _header_int(cards, "NAXIS2")
    rowbytes = _header_int(cards, "NAXIS1")
    dtype = np.dtype(
        {
            "names": [c["name"] for c in cols],
            "formats": [f"S{c['width']}" for c in cols],
            "offsets": [c["tbcol"] - 1 for c in cols],
            "itemsize": rowbytes,
        }
    )
    raw = np.frombuffer(data, dtype=dtype, count=nrows, offset=off)
    out = []
    for c in cols:
        a = np.char.strip(raw[c["name"]])
        # blank numeric fields are undefined -> NULL; a blank A field is a
        # legitimate empty string (only its TNULL sentinel means null)
        null_mask = (a == b"") if c["letter"] != "A" else np.zeros(len(a), dtype=bool)
        if c["tnull"] is not None:
            null_mask |= a == c["tnull"].encode("ascii")
        if c["letter"] == "A":
            s = np.char.decode(a, "ascii").astype(object)
            if null_mask.any():
                s = np.ma.MaskedArray(s, mask=null_mask)
            out.append(s)
            continue
        filled = np.where(null_mask, b"0", a)
        if c["letter"] == "I":
            v = filled.astype("i8")
        else:
            v = np.char.replace(np.char.replace(filled, b"D", b"E"), b"d", b"e").astype("f8")
        if c["tscale"] != 1.0 or c["tzero"] != 0.0:
            v = v.astype("f8") * c["tscale"] + c["tzero"]
        if null_mask.any():
            v = np.ma.MaskedArray(v, mask=null_mask)
        out.append(v)
    schema = fits_spark_schema(cols)
    return schema, out


def write_fits_asciitable(
    columns: list[tuple[str, str, list]],
    extname: str | None = None,
    null_token: str | None = None,
    extra_cards: list[tuple[str, object]] | None = None,
) -> bytes:
    """Test/fixture writer for ASCII TABLE extensions. ``columns`` entries
    are (name, tform, values) with tform in Aw/Iw/Fw.d/Ew.d/Dw.d; ``None``
    values are written as ``null_token`` (declared via TNULLn)."""
    nrows = len(columns[0][2]) if columns else 0
    widths = []
    for _, tform, _ in columns:
        m = _ASCII_TFORM_RE.match(tform)
        if not m:
            raise FitsFormatError(f"unparseable ASCII TFORM {tform!r}")
        widths.append(int(m.group(2)))
    rowbytes = sum(widths)
    lines = []
    for r in range(nrows):
        parts = []
        for (name, tform, vals), w in zip(columns, widths):
            v = vals[r]
            if v is None:
                s = (null_token or "").rjust(w)
            elif tform[0] == "A":
                s = str(v).ljust(w)
            elif tform[0] == "I":
                s = str(int(v)).rjust(w)
            else:
                d = int(tform.split(".")[1]) if "." in tform else 6
                s = f"{float(v):.{d}f}".rjust(w) if tform[0] == "F" else f"{float(v):.{d}E}".rjust(w)
            if len(s) > w:
                raise FitsFormatError(f"value {v!r} wider than {tform}")
            parts.append(s)
        lines.append("".join(parts))
    payload = "".join(lines).encode("ascii")
    cards = [
        _card("XTENSION", "TABLE"),
        _card("BITPIX", 8),
        _card("NAXIS", 2),
        _card("NAXIS1", rowbytes),
        _card("NAXIS2", nrows),
        _card("PCOUNT", 0),
        _card("GCOUNT", 1),
        _card("TFIELDS", len(columns)),
    ]
    tbcol = 1
    for i, ((name, tform, _), w) in enumerate(zip(columns, widths), start=1):
        cards.append(_card(f"TTYPE{i}", name))
        cards.append(_card(f"TFORM{i}", tform))
        cards.append(_card(f"TBCOL{i}", tbcol))
        if null_token is not None and tform[0] != "A":
            cards.append(_card(f"TNULL{i}", null_token))
        tbcol += w
    if extname:
        cards.append(_card("EXTNAME", extname))
    for k, v in extra_cards or []:
        cards.append(_card(k, v))
    cards.append(b"END".ljust(CARD))
    header = _pad(b"".join(cards), b" ")
    return _primary_hdu() + header + _pad(payload)


# ---------------------------------------------------------------------------
# CHECKSUM / DATASUM convention (the public FITS checksum keyword proposal:
# 1's-complement 32-bit sums, ASCII-encoded complement, whole-HDU sum of
# 0xFFFFFFFF on verify). Archives ship fpack'd + checksummed files; this is
# the integrity half of that contract.
# ---------------------------------------------------------------------------

_CHECKSUM_EXCLUDE = frozenset(b":;<=>?@[\\]^_`")


def _sum32(buf: bytes, initial: int = 0) -> int:
    """1's-complement 32-bit sum over big-endian words with end-around
    carry. FITS blocks are 2880 bytes (divisible by 4), so every header
    and padded data area is word-aligned by construction."""
    if len(buf) % 4:
        raise FitsFormatError("checksum region not 4-byte aligned")
    a = np.frombuffer(buf, dtype=">u4")
    s = int(a.sum(dtype=np.uint64)) + int(initial)
    while s >> 32:
        s = (s & 0xFFFFFFFF) + (s >> 32)
    return s


def encode_checksum(value: int) -> str:
    """ASCII-encode a 32-bit value for the CHECKSUM card: each byte is
    spread over 4 characters offset from ASCII '0' (so a '0'*16
    placeholder contributes exactly the baseline), punctuation in the
    excluded set is resolved by balanced +1/-1 pair shifts (sum
    preserved), and the 16-char string is rotated one place right to
    line its most-significant characters up with the 4-byte word grid at
    the card's value offset (column 11 = 3 mod 4)."""
    asc = bytearray(16)
    for i in range(4):
        byte = (value >> (24 - 8 * i)) & 0xFF
        q, r = divmod(byte, 4)
        ch = [0x30 + q] * 4
        ch[0] += r
        changed = True
        while changed:
            changed = False
            for j in (0, 2):
                if ch[j] in _CHECKSUM_EXCLUDE or ch[j + 1] in _CHECKSUM_EXCLUDE:
                    ch[j] += 1
                    ch[j + 1] -= 1
                    changed = True
        for j in range(4):
            asc[4 * j + i] = ch[j]
    return bytes(asc[-1:] + asc[:-1]).decode("ascii")


def _header_records(buf: bytes, off: int, data_off: int) -> list[bytes]:
    """The 80-byte card images of one header, up to and excluding END."""
    recs = []
    for p in range(off, data_off, CARD):
        card = buf[p : p + CARD]
        if card[:8].rstrip() == b"END":
            return recs
        recs.append(card)
    raise FitsFormatError("header without END card")


def add_checksums(blob: bytes) -> bytes:
    """Return ``blob`` with correct DATASUM + CHECKSUM cards on every HDU
    (existing ones replaced). DATASUM is the decimal 1's-complement sum
    of the padded data area; CHECKSUM is written so the whole-HDU sum is
    0xFFFFFFFF — asserted here, so a miswritten card can never leave
    this function."""
    out = bytearray()
    off = 0
    while off < len(blob):
        cards, data_off = _parse_header(blob, off)
        dsize = _hdu_data_size(cards)
        padded = (dsize + BLOCK - 1) // BLOCK * BLOCK
        data = blob[data_off : data_off + padded]
        recs = [
            r
            for r in _header_records(blob, off, data_off)
            if r[:8].rstrip() not in (b"DATASUM", b"CHECKSUM")
        ]
        recs.append(_card("DATASUM", str(_sum32(data))))
        recs.append(_card("CHECKSUM", "0" * 16))
        cks_rec = len(recs) - 1
        recs.append(b"END".ljust(CARD))
        header = bytearray(_pad(b"".join(recs), b" "))
        tmp = _sum32(bytes(header) + data)
        enc = encode_checksum(~tmp & 0xFFFFFFFF).encode("ascii")
        vpos = cks_rec * CARD + 11  # value chars inside the quoted string
        header[vpos : vpos + 16] = enc
        if _sum32(bytes(header) + data) != 0xFFFFFFFF:
            raise FitsFormatError("checksum encoding failed self-verification")
        out += bytes(header) + data
        off = data_off + padded
    return bytes(out)


def verify_checksums(blob: bytes) -> list[dict]:
    """Walk every HDU and report integrity: ``datasum_ok`` compares the
    stored DATASUM against the recomputed data sum, ``checksum_ok``
    requires the whole-HDU 1's-complement sum to be 0xFFFFFFFF (the
    convention's self-cancelling property — no decode step needed). A
    missing keyword reports None for its check, so callers distinguish
    'unprotected' from 'corrupt' — with one deliberate asymmetry (r8,
    found by the hypothesis tamper sweep): an HDU carrying DATASUM but
    NOT CHECKSUM reports ``checksum_ok=False``, never None. The stamper
    always writes both, so a header where exactly the CHECKSUM keyword
    has vanished is tamper evidence, and treating it as merely
    'unprotected' would let a single byte flip on the keyword itself
    defeat verification silently. (The mirror flip on DATASUM's keyword
    needs no special case: CHECKSUM's whole-HDU sum covers those bytes
    and fails on its own.)"""
    results = []
    off = 0
    idx = 0
    while off < len(blob):
        cards, data_off = _parse_header(blob, off)
        dsize = _hdu_data_size(cards)
        padded = (dsize + BLOCK - 1) // BLOCK * BLOCK
        if data_off + padded > len(blob):
            raise FitsFormatError("truncated HDU data area")
        data = blob[data_off : data_off + padded]
        entry: dict = {"hdu": idx, "extname": cards.get("EXTNAME")}
        entry["datasum_ok"] = (
            int(cards["DATASUM"]) == _sum32(data) if "DATASUM" in cards else None
        )
        if "CHECKSUM" in cards:
            entry["checksum_ok"] = (
                _sum32(blob[off : data_off + padded]) == 0xFFFFFFFF
            )
        elif "DATASUM" in cards:
            # stamped files carry BOTH; a lone DATASUM means the CHECKSUM
            # card was destroyed — tamper evidence, not 'unprotected'
            entry["checksum_ok"] = False
        else:
            entry["checksum_ok"] = None
        results.append(entry)
        off = data_off + padded
        idx += 1
    return results


def catalog_hdus(blob: bytes) -> list[dict]:
    """Header-only walk of every HDU in a FITS file: index, EXTNAME,
    extension type, row/column counts and data-area bytes — WITHOUT
    touching the data areas (the walk seeks by the standard size formula,
    so cataloging a multi-GB file costs only its header blocks). This is
    the manifest step a bulk loader runs before scheduling per-HDU ingest
    jobs: which extensions exist, under what names, and how big each is."""
    out = []
    off = 0
    idx = 0
    while off < len(blob):
        cards, data_off = _parse_header(blob, off)
        dsize = _hdu_data_size(cards)
        padded = (dsize + BLOCK - 1) // BLOCK * BLOCK
        if data_off + padded > len(blob):
            raise FitsFormatError("truncated HDU data area")
        xt = str(cards.get("XTENSION", "PRIMARY")).strip()
        naxis = _header_int(cards, "NAXIS")
        out.append(
            {
                "hdu": idx,
                "extname": cards.get("EXTNAME"),
                "xtension": xt,
                "n_rows": _header_int(cards, "NAXIS2") if naxis >= 2 else 0,
                "n_cols": int(cards["TFIELDS"]) if "TFIELDS" in cards else 0,
                "data_bytes": dsize,
            }
        )
        off = data_off + padded
        idx += 1
    return out


def read_fits_catalog(spark: SparkSession, path: str) -> DataFrame:
    """Distributed HDU manifest over a file / glob of FITS files: one row
    per HDU with (file, hdu, extname, xtension, n_rows, n_cols,
    data_bytes). Runs :func:`catalog_hdus` executor-side per file via
    mapInArrow — header blocks only, no data decode, so the scan cost is
    O(files), not O(bytes); at archive scale this is the planning query
    that decides which HDUs are worth a full ingest pass."""
    import os as _os

    import pyarrow as pa

    from ..session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    files = spark.read.format("binaryFile").load(path)
    schema = StructType(
        [
            StructField("file", StringType()),
            StructField("hdu", IntegerType()),
            StructField("extname", StringType()),
            StructField("xtension", StringType()),
            StructField("n_rows", LongType()),
            StructField("n_cols", IntegerType()),
            StructField("data_bytes", LongType()),
        ]
    )

    def walk(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            rows: list[dict] = []
            for pathv, payload in zip(tbl.column("path"), tbl.column("content")):
                base = _os.path.basename(str(pathv.as_py()))
                for e in catalog_hdus(payload.as_py()):
                    rows.append(
                        {
                            "file": base,
                            "hdu": e["hdu"],
                            "extname": e["extname"],
                            "xtension": e["xtension"],
                            "n_rows": e["n_rows"],
                            "n_cols": e["n_cols"],
                            "data_bytes": e["data_bytes"],
                        }
                    )
            yield pa.RecordBatch.from_pylist(rows, schema=pa.schema(
                [
                    pa.field("file", pa.string()),
                    pa.field("hdu", pa.int32()),
                    pa.field("extname", pa.string()),
                    pa.field("xtension", pa.string()),
                    pa.field("n_rows", pa.int64()),
                    pa.field("n_cols", pa.int32()),
                    pa.field("data_bytes", pa.int64()),
                ]
            ))

    return files.select("path", "content").mapInArrow(walk, schema=schema)


# ---------------------------------------------------------------------------
# IMAGE extensions (XTENSION = 'IMAGE' / primary arrays) -> pixel tables
# ---------------------------------------------------------------------------

_BITPIX_DTYPES = {8: "u1", 16: ">i2", 32: ">i4", 64: ">i8", -32: ">f4", -64: ">f8"}


def write_fits_image(
    data: "np.ndarray",
    bscale: float = 1.0,
    bzero: float = 0.0,
    extname: str | None = None,
    out: io.IOBase | None = None,
    blank: int | None = None,
) -> bytes:
    """Build a FITS file whose first extension is a 2-D IMAGE HDU. BITPIX
    follows the array dtype; BSCALE/BZERO are written as given (the stored
    integers are the RAW values — physical = BZERO + BSCALE * raw, applied
    by the reader per the standard). ``blank`` emits the BLANK card — the
    integer-image undefined-pixel sentinel (FITS 4.0 §4.4.2.5, integer
    BITPIX only), the IMAGE-HDU analogue of a BINTABLE TNULLn."""
    if blank is not None and data.dtype.kind not in "iu":
        raise FitsFormatError("BLANK is only defined for integer BITPIX")
    inv = {v.lstrip(">"): k for k, v in _BITPIX_DTYPES.items()}
    key = data.dtype.newbyteorder("=").str.lstrip("<>=|")
    if key not in inv:
        raise FitsFormatError(f"unsupported image dtype {data.dtype}")
    bitpix = inv[key]
    h, w = data.shape
    cards = [
        _card("XTENSION", "IMAGE"),
        _card("BITPIX", bitpix),
        _card("NAXIS", 2),
        _card("NAXIS1", w),
        _card("NAXIS2", h),
        _card("PCOUNT", 0),
        _card("GCOUNT", 1),
    ]
    if bscale != 1.0:
        cards.append(_card("BSCALE", bscale))
    if bzero != 0.0:
        cards.append(_card("BZERO", bzero))
    if extname is not None:
        cards.append(_card("EXTNAME", extname))
    if blank is not None:
        cards.append(_card("BLANK", int(blank)))
    cards.append(b"END".ljust(CARD))
    hdr = _pad(b"".join(cards), b" ")
    payload = data.astype(_BITPIX_DTYPES[bitpix]).tobytes()
    blob = _primary_hdu() + hdr + _pad(payload)
    if out is not None:
        out.write(blob)
    return blob


def decode_image(data: bytes, hdu: int | str = 1):
    """IMAGE HDU -> (schema, [x, y, val]) pixel table: one row per pixel,
    x = column (NAXIS1, the fastest axis), y = row, val = the PHYSICAL
    value BZERO + BSCALE * raw as double. The same (schema, columns)
    contract as :func:`decode_bintable`, so the parallel Spark read path
    is shared."""
    off, idx = 0, 0
    while True:
        cards, data_off = _parse_header(data, off)
        is_image = (idx == 0 and cards.get("SIMPLE") == "T") or cards.get(
            "XTENSION", ""
        ).strip() == "IMAGE"
        match = (
            is_image
            and _header_int(cards, "NAXIS") == 2
            and (
                (isinstance(hdu, int) and idx == hdu)
                or (isinstance(hdu, str) and cards.get("EXTNAME") == hdu)
            )
        )
        if match:
            break
        dsize = _hdu_data_size(cards)
        off = data_off + (dsize + BLOCK - 1) // BLOCK * BLOCK
        idx += 1
        if off >= len(data):
            raise FitsFormatError(f"IMAGE HDU {hdu!r} not found")
    w = _header_int(cards, "NAXIS1")
    h = _header_int(cards, "NAXIS2")
    bitpix = _header_int(cards, "BITPIX")
    try:
        dt = np.dtype(_BITPIX_DTYPES[bitpix])
    except KeyError as e:
        raise FitsFormatError(f"bad BITPIX {bitpix}") from e
    bscale = float(cards.get("BSCALE", 1.0))
    bzero = float(cards.get("BZERO", 0.0))
    # BLANK: undefined-pixel sentinel on RAW stored values (integer BITPIX
    # only, like a BINTABLE TNULLn) -> SQL NULL after scaling
    blank = int(cards["BLANK"]) if "BLANK" in cards and bitpix > 0 else None
    raw = np.frombuffer(data, dtype=dt, count=w * h, offset=data_off)
    x = np.tile(np.arange(w, dtype="i4"), h)
    y = np.repeat(np.arange(h, dtype="i4"), w)
    val = bzero + bscale * raw.astype("f8")
    if blank is not None:
        val = np.ma.MaskedArray(val, mask=raw == blank)
    schema = StructType(
        [
            StructField("x", IntegerType(), False),
            StructField("y", IntegerType(), False),
            StructField("val", DoubleType(), blank is not None),
        ]
    )
    return schema, [x, y, val]


def read_fits_image(
    spark: SparkSession,
    path: str,
    hdu: int | str = 1,
    schema: StructType | None = None,
    verify_checksum: bool = False,
) -> DataFrame:
    """Read IMAGE extension(s) as a pixel table — one (x, y, val) row per
    pixel with BSCALE/BZERO applied. Same per-file parallel decode as
    :func:`read_fits` (and the same ``verify_checksum`` contract); the
    tabular view is what makes array data joinable (source catalogs x
    cutouts) in the same engine as everything else."""
    return _read_fits_with(
        spark, path, hdu, schema, _maybe_verifying(decode_image, verify_checksum)
    )


def write_fits_cube(
    data: "np.ndarray",
    bscale: float = 1.0,
    bzero: float = 0.0,
    extname: str | None = None,
    out: io.IOBase | None = None,
    blank: int | None = None,
) -> bytes:
    """Build a FITS file whose first extension is a 3-D IMAGE HDU (a
    spectral cube: NAXIS1 = x, NAXIS2 = y, NAXIS3 = channel — the radio /
    IFU data product). ``data`` is indexed [z, y, x] (C order matches the
    FITS axis-1-fastest serialization); BSCALE/BZERO and the ``blank``
    undefined-voxel sentinel as in :func:`write_fits_image`."""
    if blank is not None and data.dtype.kind not in "iu":
        raise FitsFormatError("BLANK is only defined for integer BITPIX")
    inv = {v.lstrip(">"): k for k, v in _BITPIX_DTYPES.items()}
    key = data.dtype.newbyteorder("=").str.lstrip("<>=|")
    if key not in inv:
        raise FitsFormatError(f"unsupported cube dtype {data.dtype}")
    bitpix = inv[key]
    nz, h, w = data.shape
    cards = [
        _card("XTENSION", "IMAGE"),
        _card("BITPIX", bitpix),
        _card("NAXIS", 3),
        _card("NAXIS1", w),
        _card("NAXIS2", h),
        _card("NAXIS3", nz),
        _card("PCOUNT", 0),
        _card("GCOUNT", 1),
    ]
    if bscale != 1.0:
        cards.append(_card("BSCALE", bscale))
    if bzero != 0.0:
        cards.append(_card("BZERO", bzero))
    if extname is not None:
        cards.append(_card("EXTNAME", extname))
    if blank is not None:
        cards.append(_card("BLANK", int(blank)))
    cards.append(b"END".ljust(CARD))
    hdr = _pad(b"".join(cards), b" ")
    payload = data.astype(_BITPIX_DTYPES[bitpix]).tobytes()
    blob = _primary_hdu() + hdr + _pad(payload)
    if out is not None:
        out.write(blob)
    return blob


def decode_cube(data: bytes, hdu: int | str = 1):
    """3-D IMAGE HDU -> (x, y, z, val) voxel table: x is the fastest FITS
    axis (NAXIS1), z the channel (NAXIS3); val is the PHYSICAL value
    BZERO + BSCALE * raw as double. Same (schema, columns) contract as
    :func:`decode_image`, so the parallel Spark read path is shared."""
    off, idx = 0, 0
    while True:
        cards, data_off = _parse_header(data, off)
        is_image = (idx == 0 and cards.get("SIMPLE") == "T") or cards.get(
            "XTENSION", ""
        ).strip() == "IMAGE"
        match = (
            is_image
            and _header_int(cards, "NAXIS") == 3
            and (
                (isinstance(hdu, int) and idx == hdu)
                or (isinstance(hdu, str) and cards.get("EXTNAME") == hdu)
            )
        )
        if match:
            break
        dsize = _hdu_data_size(cards)
        off = data_off + (dsize + BLOCK - 1) // BLOCK * BLOCK
        idx += 1
        if off >= len(data):
            raise FitsFormatError(f"3-D IMAGE HDU {hdu!r} not found")
    w = _header_int(cards, "NAXIS1")
    h = _header_int(cards, "NAXIS2")
    nz = _header_int(cards, "NAXIS3")
    bitpix = _header_int(cards, "BITPIX")
    try:
        dt = np.dtype(_BITPIX_DTYPES[bitpix])
    except KeyError as e:
        raise FitsFormatError(f"bad BITPIX {bitpix}") from e
    bscale = float(cards.get("BSCALE", 1.0))
    bzero = float(cards.get("BZERO", 0.0))
    blank = int(cards["BLANK"]) if "BLANK" in cards and bitpix > 0 else None
    raw = np.frombuffer(data, dtype=dt, count=w * h * nz, offset=data_off)
    x = np.tile(np.arange(w, dtype="i4"), h * nz)
    y = np.tile(np.repeat(np.arange(h, dtype="i4"), w), nz)
    z = np.repeat(np.arange(nz, dtype="i4"), w * h)
    val = bzero + bscale * raw.astype("f8")
    if blank is not None:
        val = np.ma.MaskedArray(val, mask=raw == blank)
    schema = StructType(
        [
            StructField("x", IntegerType(), False),
            StructField("y", IntegerType(), False),
            StructField("z", IntegerType(), False),
            StructField("val", DoubleType(), blank is not None),
        ]
    )
    return schema, [x, y, z, val]


def read_fits_cube(
    spark: SparkSession,
    path: str,
    hdu: int | str = 1,
    schema: StructType | None = None,
    verify_checksum: bool = False,
) -> DataFrame:
    """Read 3-D IMAGE extension(s) as a voxel table — one (x, y, z, val)
    row per voxel with BSCALE/BZERO applied; same per-file parallel decode
    contract as :func:`read_fits_image`."""
    return _read_fits_with(
        spark, path, hdu, schema, _maybe_verifying(decode_cube, verify_checksum)
    )
