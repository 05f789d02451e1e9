"""Command-line entry point: ``python -m fits2db_spark``.

The reference tool is a CLI (SURVEY.md §3.1: argv -> dialect / table /
create / drop / truncate / HDU / chunk options -> DDL + CSV/COPY text or a
direct database load). This wrapper reproduces that surface on the Spark
engine:

    python -m fits2db_spark data/*.fits --table stars --create --dialect postgres
    python -m fits2db_spark cat.fits --table t --ddl-only
    python -m fits2db_spark cat.fits --table t --csv-out /tmp/out
    python -m fits2db_spark cat.fits --table t \
        --jdbc-url jdbc:derby:/tmp/db;create=true \
        --jdbc-driver org.apache.derby.jdbc.EmbeddedDriver --mode create

Differences from the reference, by design (Spark-first): the "chunked row
loop" is Spark's per-file parallel decode (one task per FITS file); CSV
output is a partitioned directory unless --single-file; the JDBC load runs
one connection per partition (--num-partitions caps it to the database's
ingest capacity, not the cluster's core count).
"""

from __future__ import annotations

import argparse
import functools
import sys

from pyspark.sql import DataFrame, SparkSession


def _positive_int(raw: str) -> int:
    v = int(raw)
    if v < 1:
        raise argparse.ArgumentTypeError(f"must be >= 1, got {raw}")
    return v


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="fits2db_spark",
        description="FITS binary tables -> SQL (DDL / CSV / JDBC), on Spark.",
    )
    p.add_argument("inputs", nargs="+", help="FITS file(s) or glob(s)")
    p.add_argument("--table", required=True, help="target SQL table name")
    p.add_argument(
        "--hdu",
        default="1",
        help="BINTABLE extension: 1-based index or EXTNAME (default 1)",
    )
    p.add_argument(
        "--ascii",
        action="store_true",
        help="inputs are ASCII TABLE extensions (XTENSION=TABLE) instead of BINTABLE",
    )
    p.add_argument(
        "--image",
        action="store_true",
        help="inputs are IMAGE extensions: load one (x, y, val) row per "
        "pixel with BSCALE/BZERO applied",
    )
    p.add_argument(
        "--verify-checksum",
        action="store_true",
        help="validate CHECKSUM/DATASUM on every HDU before decode; "
        "fail the load on the first corrupt HDU (unprotected files pass)",
    )
    p.add_argument(
        "--dialect",
        default="postgres",
        choices=("postgres", "sqlite", "mysql", "duckdb"),
        help="SQL dialect for DDL / column types",
    )
    # DDL emission (the reference's --create/--drop/--truncate trio)
    p.add_argument("--create", action="store_true", help="emit CREATE TABLE DDL")
    p.add_argument("--drop", action="store_true", help="emit DROP TABLE first")
    p.add_argument("--truncate", action="store_true", help="emit TRUNCATE TABLE")
    p.add_argument("--ddl-only", action="store_true", help="emit DDL and exit")
    p.add_argument("--sql-out", default="-", help="DDL destination file ('-' = stdout)")
    # Parquet sink (the lakehouse landing zone)
    p.add_argument("--parquet-out", help="write rows as parquet to this directory")
    p.add_argument(
        "--partition-by",
        help="comma-separated columns for parquet directory partitioning "
        "(hive layout: col=value/ subdirs enable partition pruning)",
    )
    # CSV sink
    p.add_argument("--csv-out", help="write rows as CSV to this directory")
    p.add_argument("--single-file", action="store_true", help="coalesce CSV to one part")
    p.add_argument("--delimiter", default=",")
    p.add_argument("--null-marker", default=r"\N", help="NULL text (COPY default \\N)")
    # VOTable sink (IVOA XML — the astronomy service response format)
    p.add_argument(
        "--votable-out",
        help="write rows as a VOTable 1.4 document (file path; "
        "distributed fragment layout with --votable-fragments)",
    )
    p.add_argument(
        "--votable-fragments",
        action="store_true",
        help="emit header/footer + one XML fragment per partition instead "
        "of collecting a single document",
    )
    p.add_argument(
        "--votable-limit",
        type=_positive_int,
        default=10_000,
        help="row bound for the single-document VOTable path; exceeding it "
        "is an error (never a silent truncation) — use --votable-fragments "
        "for complete large exports (default 10000)",
    )
    # JDBC sink
    p.add_argument("--jdbc-url", help="load rows into this JDBC database")
    p.add_argument("--jdbc-driver", help="JDBC driver class name")
    p.add_argument(
        "--mode",
        default="create",
        choices=("create", "append", "overwrite", "truncate"),
        help="JDBC load mode",
    )
    p.add_argument("--batchsize", type=int, default=10_000, help="rows per JDBC batch")
    p.add_argument(
        "--num-partitions",
        type=int,
        help="cap concurrent JDBC connections / CSV part files",
    )
    return p


def _hdu_arg(raw: str) -> int | str:
    try:
        return int(raw)
    except ValueError:
        return raw


def load_frame(spark: SparkSession, args: argparse.Namespace) -> DataFrame:
    """Union all matched FITS inputs into one DataFrame (schema from the
    first file's header — declared, never inferred)."""
    from .sources.fits import read_fits, read_fits_ascii, read_fits_image

    hdu = _hdu_arg(args.hdu)
    if getattr(args, "image", False):
        base = read_fits_image
    elif getattr(args, "ascii", False):
        base = read_fits_ascii
    else:
        base = read_fits
    # --verify-checksum composes with every reader (all three accept the
    # flag; checksums cover BINTABLE, TABLE and IMAGE HDUs alike)
    verify = bool(getattr(args, "verify_checksum", False))
    # functools.partial keeps the reader signature single-sourced: any future
    # reader kwarg flows through instead of being dropped by a shim, and the
    # hdu default stays defined in one place (the reader itself)
    reader = functools.partial(base, verify_checksum=verify)

    df = reader(spark, args.inputs[0], hdu=hdu)
    for path in args.inputs[1:]:
        df = df.unionByName(reader(spark, path, hdu=hdu, schema=df.schema))
    return df


def emit_ddl(schema, args: argparse.Namespace, out) -> None:
    from .sinks.ddl import create_table_ddl, drop_table_ddl, truncate_table_ddl

    if args.drop:
        print(drop_table_ddl(args.table, args.dialect), file=out)
    if args.create or args.ddl_only:
        print(create_table_ddl(schema, args.table, args.dialect), file=out)
    if args.truncate:
        print(truncate_table_ddl(args.table, args.dialect), file=out)


def run(argv: list[str], spark: SparkSession | None = None) -> int:
    args = build_parser().parse_args(argv)
    if spark is None:
        from .session import get_spark

        spark = get_spark("fits2db_spark_cli")

    df = load_frame(spark, args)

    wants_ddl = args.create or args.drop or args.truncate or args.ddl_only
    if wants_ddl:
        if args.sql_out == "-":
            emit_ddl(df.schema, args, sys.stdout)
        else:
            with open(args.sql_out, "w") as f:
                emit_ddl(df.schema, args, f)
    if args.ddl_only:
        return 0

    did_output = False
    if args.parquet_out:
        out_df = df.repartition(args.num_partitions) if args.num_partitions else df
        writer = out_df.write.mode("overwrite")
        if args.partition_by:
            writer = writer.partitionBy(
                *[c.strip() for c in args.partition_by.split(",") if c.strip()]
            )
        writer.parquet(args.parquet_out)
        did_output = True
    if args.csv_out:
        from .sinks.csv_sink import write_csv

        out_df = df.repartition(args.num_partitions) if args.num_partitions else df
        write_csv(
            out_df,
            args.csv_out,
            delimiter=args.delimiter,
            null_marker=args.null_marker,
            single_file=args.single_file,
        )
        did_output = True
    if args.votable_out:
        from .sinks.votable import votable_string, write_votable_fragments

        if args.votable_fragments:
            write_votable_fragments(df, args.votable_out, table_name=args.table)
        else:
            # raises (never silently truncates) when the result exceeds
            # --votable-limit; the error points at --votable-fragments
            with open(args.votable_out, "w") as f:
                f.write(
                    votable_string(df, table_name=args.table, limit=args.votable_limit)
                )
        did_output = True
    if args.jdbc_url:
        from .sinks.jdbc import write_jdbc

        write_jdbc(
            df,
            args.jdbc_url,
            args.table,
            mode=args.mode,
            dialect=args.dialect,
            batchsize=args.batchsize,
            num_partitions=args.num_partitions,
            driver=args.jdbc_driver,
        )
        did_output = True

    if not did_output and not wants_ddl:
        # dry run: schema + row count (the reference prints a summary too)
        print(f"table {args.table}: {df.count()} rows")
        for f in df.schema.fields:
            print(f"  {f.name}: {f.dataType.simpleString()}")
    return 0


def main() -> None:
    sys.exit(run(sys.argv[1:]))
