"""LLM pipeline — embedding / similarity operators (SURVEY.md §2.N).

All cosine math is done in DOUBLE via JVM higher-order functions
(zip_with/aggregate) — no Python in the data path. The oracle replicates the
same double-precision expressions element-by-element (never DuckDB's
float32 ``list_cosine_similarity``), with ROUND(6) absorbing summation-order
ulps.

100 TB design notes:
* brute-force top-k broadcasts the (small) query set and computes partial
  top-k per partition before the final k-merge — never a global sort;
* the LSH variant buckets both sides by sign bits so the candidate join is
  equi on (bucket) — shuffle volume scales with bucket occupancy;
* block-matmul (mapInArrow + numpy GEMM over broadcast query blocks) is the
  next rung when query count grows — the operator API stays the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load

_DIM = 64


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def _nearest_cells(dists, n):
    """1-based indexes of the ``n`` smallest entries of a distance-array
    column, tie-safe: each distance is paired with its cell index BEFORE
    sorting, so duplicate distances (e.g. collapsed k-means centroids) still
    yield DISTINCT cells. (An ``array_position`` lookup on the sorted raw
    distances returns the first match for every tie — regression-tested in
    tests/test_rows_only_quality.py::test_ivf_nearest_cells_tie_safe.)"""
    pairs = F.transform(dists, lambda d, i: F.struct(d.alias("d"), i.alias("i")))
    return F.transform(
        F.slice(F.array_sort(pairs), 1, n), lambda s: (s["i"] + 1).cast("int")
    )


def _cos(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


# DuckDB equivalents (explicit double math, element order identical)
_D_DOT = (
    "list_sum(list_transform(generate_series(1, {d}),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _d_dot(a, b):
    return _D_DOT.format(a=a, b=b, d=_DIM)


def _d_norm(a):
    return f"sqrt({_d_dot(a, a)})"


def _d_cos(a, b):
    return f"({_d_dot(a, b)} / ({_d_norm(a)} * {_d_norm(b)}))"


@register(
    "vec_norm_stats",
    oracle=f"""
    SELECT label, COUNT(*) AS n,
           ROUND(AVG({_d_norm('embedding')}), 6) AS avg_norm,
           ROUND(MIN({_d_norm('embedding')}), 6) AS min_norm,
           ROUND(MAX({_d_norm('embedding')}), 6) AS max_norm
    FROM embeddings GROUP BY label
    """,
)
def vec_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    nrm = _norm(F.col("embedding"))
    return (
        e.select("label", nrm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
        )
    )


@register(
    "vec_centroid",
    oracle=f"""
    SELECT label, pos, ROUND(AVG(v), 6) AS centroid_v
    FROM (SELECT label,
                 unnest(generate_series(0, {_DIM - 1})) AS pos,
                 unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
          FROM embeddings)
    GROUP BY label, pos
    """,
)
def vec_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid (elementwise mean). posexplode + groupBy(label,pos)
    keeps partial aggregation map-side; result is label x dim rows — tiny at
    any corpus size."""
    e = load(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode(F.col("embedding")).alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid_v"))
    )


@register(
    "sim_pair_cosine",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND({_d_cos('a.embedding', 'b.embedding')}, 6) AS cos_sim,
           ROUND({_d_dot('a.embedding', 'b.embedding')}, 6) AS dot
    FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 250
    WHERE a.vec_id < 250
    """,
)
def sim_pair_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine similarity for explicit id pairs (vec i vs vec i+250)."""
    e = load(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea")).filter(
        F.col("id_a") < 250
    )
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    j = a.join(b, F.col("id_b") == F.col("id_a") + 250)
    return j.select(
        "id_a",
        "id_b",
        F.round(_cos(F.col("ea"), F.col("eb")), 6).alias("cos_sim"),
        F.round(_dot(F.col("ea"), F.col("eb")), 6).alias("dot"),
    )


@register(
    "sim_topk_bruteforce",
    oracle=f"""
    SELECT * FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND({_d_cos('q.embedding', 'c.embedding')}, 6) AS cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_d_cos('q.embedding', 'c.embedding')} DESC, c.vec_id) AS rk
      FROM embeddings q CROSS JOIN embeddings c
      WHERE q.vec_id < 3 AND c.vec_id != q.vec_id) t
    WHERE rk <= 5
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k nearest neighbors for a small query set.

    The query side is broadcast (tiny) and the corpus streams through the
    nested-loop probe; the per-query top-k is a WindowGroupLimit, so only k
    rows per query survive each partition before the final merge. For large
    query sets the same API is served by block-matmul (mapInArrow + numpy)
    or the LSH variant below."""
    e = load(spark, sf_dir, "embeddings")
    # self-norms hoisted per ROW (r14, the vec_hubness/ml_knn_classify fix):
    # one 64-dim fold (the dot) per pair instead of three — bit-identical
    # cosine, same folds and division order.
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        _norm(F.col("embedding")).alias("qn"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        _norm(F.col("embedding")).alias("cn"),
    )
    sim = _dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim_raw").desc(), "neighbor_id")
    return (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("sim_raw"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select(
            "query_id", "neighbor_id", F.round("sim_raw", 6).alias("cos_sim"), "rk"
        )
    )


# Multi-table coordinate-hyperplane LSH: table t hashes the SIGNS of dims
# (t, t+16, t+32, t+48) into a 4-bit bucket; candidates are the union over
# all 16 tables. One 4-bit table recalls only ~17% of true top-3 neighbors
# on the fixture embeddings; the 16-table union measures 97% (asserted in
# tests/test_rows_only_quality.py). At larger corpus scale, grow bits per
# table ~log2(n) to keep buckets small; table count trades recall for probe
# cost exactly as here.
_LSH_TABLES = 16
_LSH_BITS = 4


def _table_dims(t: int) -> list[int]:
    return [t + 16 * k for k in range(_LSH_BITS)]


def _bucket(col, t: int):
    b = F.lit(0)
    for k, d in enumerate(_table_dims(t)):
        b = b + F.when(col[d] > 0, F.lit(1 << k)).otherwise(F.lit(0))
    return b


def _bucket_sql(alias: str, t: int) -> str:
    return " + ".join(
        f"(CASE WHEN {alias}.embedding[{d + 1}] > 0 THEN {1 << k} ELSE 0 END)"
        for k, d in enumerate(_table_dims(t))
    )


def _bands_sql(filter_sql: str) -> str:
    return " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, {_bucket_sql('embeddings', t)} AS bucket "
        f"FROM embeddings {filter_sql}"
        for t in range(_LSH_TABLES)
    )


# Query-side multi-probe (Lv et al. 2007): besides its own bucket, each
# query probes the 4 buckets at Hamming distance 1 in every table. The
# corpus-side index is untouched — the 100 TB posture, where the bucketed
# corpus layout is immutable and only the (tiny, broadcast) query side fans
# out 5x. Raises recall@3 at sf0.1 from 0.778 (exact-bucket probe, r14
# scale-gate finding) to ~1 bit of sign-noise tolerance per table.
_LSH_PROBE_FLIPS = (0, 1, 2, 4, 8)


@register(
    "sim_ann_lsh",
    oracle=f"""
    WITH qb0 AS ({_bands_sql("WHERE vec_id < 10")}),
    qb AS (
      SELECT vec_id, tbl, xor(bucket, f.flip) AS bucket
      FROM qb0 CROSS JOIN (
        SELECT unnest([{", ".join(str(f) for f in _LSH_PROBE_FLIPS)}]) AS flip
      ) f
    ),
    cb AS ({_bands_sql("")}),
    cand AS (
      SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
      FROM qb JOIN cb ON qb.tbl = cb.tbl AND qb.bucket = cb.bucket
       AND cb.vec_id != qb.vec_id
    )
    SELECT * FROM (
      SELECT cand.query_id, cand.neighbor_id,
             ROUND({_d_cos('q.embedding', 'c.embedding')}, 6) AS cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY cand.query_id
               ORDER BY {_d_cos('q.embedding', 'c.embedding')} DESC, cand.neighbor_id
             ) AS rk
      FROM cand
      JOIN embeddings q ON q.vec_id = cand.query_id
      JOIN embeddings c ON c.vec_id = cand.neighbor_id) t
    WHERE rk <= 3
    """,
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via multi-table sign-bit LSH: 16 tables of 4 coordinate-
    hyperplane bits each; candidate pairs are the DISTINCT union of
    same-(table, bucket) collisions, then exact cosine + top-3 within
    candidates. Distinct-before-rank matters: a pair colliding in several
    tables would otherwise occupy several row_number slots. The QUERY side
    multi-probes each table's Hamming-1 bucket ring (_LSH_PROBE_FLIPS) —
    one flipped sign bit no longer loses the table, which lifted recall@3
    at sf0.1 from 0.778 to the gate floor, at zero corpus-index cost. The
    scale path for similarity search — per-table the join is hash on
    bucket id, and the probe cost is (tables x probes / buckets) of the
    corpus per query; the corpus-side bucketed layout is immutable."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)

    def banded(df, id_alias, probe: bool = False):
        buckets = F.array(*[_bucket(F.col("embedding"), t) for t in range(_LSH_TABLES)])
        out = df.select(
            F.col("vec_id").alias(id_alias), F.posexplode(buckets).alias("tbl", "bucket")
        )
        if probe:
            flips = F.array(*[F.lit(f) for f in _LSH_PROBE_FLIPS])
            out = out.select(
                id_alias,
                "tbl",
                F.explode(
                    F.transform(flips, lambda f: F.col("bucket").bitwiseXOR(f))
                ).alias("bucket"),
            )
        return out

    cand = (
        F.broadcast(banded(q, "query_id", probe=True))
        .join(banded(e, "neighbor_id"), ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    # self-norms hoisted per ROW (r14): one fold per candidate pair.
    qe = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        _norm(F.col("embedding")).alias("qn"),
    )
    ce = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        _norm(F.col("embedding")).alias("cn"),
    )
    sim = _dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim_raw").desc(), "neighbor_id")
    return (
        cand.join(F.broadcast(qe), "query_id")
        .join(ce, "neighbor_id")
        .select("query_id", "neighbor_id", sim.alias("sim_raw"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "query_id", "neighbor_id", F.round("sim_raw", 6).alias("cos_sim"), "rk"
        )
    )


@register(
    "dedup_embed_cosine",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND({_d_cos('a.embedding', 'b.embedding')}, 6) AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_d_cos('a.embedding', 'b.embedding')} >= 0.35
    """,
)
def dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by label (a cheap coarse
    quantizer): only same-label pairs are compared. At 100 TB the blocking
    key comes from an IVF/LSH assignment instead of a given label — the
    join shape is identical."""
    e = load(spark, sf_dir, "embeddings")
    # self-norms hoisted per ROW (r14): one fold per blocked pair.
    a = e.select(
        F.col("vec_id").alias("id_a"),
        F.col("label").alias("la"),
        F.col("embedding").alias("ea"),
        _norm(F.col("embedding")).alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("lb"),
        F.col("embedding").alias("eb"),
        _norm(F.col("embedding")).alias("nb"),
    )
    sim = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b", sim.alias("sim_raw"))
        .filter(F.col("sim_raw") >= 0.35)
        .select("id_a", "id_b", F.round("sim_raw", 6).alias("cos_sim"))
    )


@register(
    "multimodal_join",
    oracle=f"""
    SELECT d.doc_id, d.lang, d.n_chars, e.label,
           ROUND({_d_norm('e.embedding')}, 6) AS vnorm
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    WHERE d.lang IN ('en', 'de') AND d.n_chars > 200 AND e.label < 5
    """,
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text x vector modality join with filters on both sides — both filters
    push to their respective parquet scans before the join."""
    d = load(spark, sf_dir, "documents").filter(
        F.col("lang").isin("en", "de") & (F.col("n_chars") > 200)
    )
    e = load(spark, sf_dir, "embeddings").filter(F.col("label") < 5)
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        "lang",
        "n_chars",
        "label",
        F.round(_norm(F.col("embedding")), 6).alias("vnorm"),
    )


@register(
    "sim_range_search",
    oracle=f"""
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROUND({_d_cos('q.embedding', 'c.embedding')}, 6) AS cos_sim
    FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
    WHERE q.vec_id < 5
      AND {_d_cos('q.embedding', 'c.embedding')} >= 0.35
    """,
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (threshold) similarity search: ALL neighbors above a cosine
    floor for each query — the retrieval-filtering companion to top-k.
    Broadcast query side + corpus stream; at larger query sets the same
    predicate runs over the multi-table LSH candidates (sim_ann_lsh's
    _lsh-style bucketing) instead of the full cross product."""
    e = load(spark, sf_dir, "embeddings")
    # self-norms hoisted per ROW (r14): one fold per streamed pair.
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        _norm(F.col("embedding")).alias("qn"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        _norm(F.col("embedding")).alias("cn"),
    )
    sim = _dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
    return (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(sim, 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.35)
    )


from ..registry import deprioritize  # noqa: E402
from ..tables import register_aux_cache  # noqa: E402

deprioritize("sim_range_search")

# Trained IVF centroids per (session, sf_dir, k, iters). Registered so
# tables.clear_cache() stays the ONE reset path (the _TRI_EDGE_CACHE leak
# class). VERDICT r11 item 5: sim_ann_ivf and sim_ivf_balance each ran
# their own identical 3-round Lloyd train (3 collect jobs apiece) — under
# bench conditions nothing memoized, so the second operator re-paid the
# whole train. Now they share one.
_IVF_TRAIN_CACHE: dict = register_aux_cache({})


def _ivf_nearest(cents, n):
    """Stable-label nearest-cell expression: top-``n`` cell LABELS for the
    row's ``embedding`` against the (label, centroid) list ``cents``.
    Labels stay stable if a Lloyd round empties a cell (positional
    collapse would relabel every higher cell and diverge from the
    oracle's stable-label CTEs)."""

    def dist2_to(c):
        return F.aggregate(
            F.zip_with(
                F.col("embedding"),
                c,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )

    cent_array = F.array(*[F.array(*[F.lit(v) for v in c]) for _, c in cents])
    labels = F.array(*[F.lit(lb) for lb, _ in cents])
    return F.transform(
        _nearest_cells(F.transform(cent_array, dist2_to), n),
        lambda p: F.element_at(labels, p),
    )


def _lloyd_mean_update(spark: SparkSession, e: DataFrame, cents):
    """One Lloyd round (assign + mean) as a single vectorized pass: each
    Arrow batch assigns its vectors to the nearest centroid in numpy
    (exact per-pair elementwise (x-c)^2 sums; ``argmin`` over the
    ascending-label centroid list reproduces the ties-to-lowest-label rule
    of `_ivf_nearest` / the kmeans struct-min) and emits only per-cell
    partial sums and counts — k x (d+1) doubles per batch — which one tiny
    groupBy reduces; k x d doubles reach the driver. Replaces the
    posexplode (n x d rows) + groupBy(cell, pos) round shape: the shuffle
    no longer scales with the corpus, and the plan carries no centroid
    literals, so nothing is Janino-recompiled per round (the failure that
    sank the r14 columnar-aggregate prototype recorded below). Mean
    fold-order shifts vs the relational avg are the same ulp class as the
    engine-vs-oracle difference the operators already absorb (each engine
    folds its own order; assignment margins sit many orders above 1e-13).

    Empty cells drop from the returned list with every other label stable,
    matching the relational form's semantics."""
    import numpy as np
    import pandas as pd

    labels = [lb for lb, _ in cents]
    assert labels == sorted(labels), "centroid labels must be ascending"
    lbs = np.asarray(labels, dtype=np.int64)
    cc = np.asarray([c for _, c in cents], dtype=np.float64)
    k, d = cc.shape

    def partial(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(list(pdf["embedding"]), dtype=np.float64)
            sums = np.zeros((k, d))
            counts = np.zeros(k, dtype=np.int64)
            for lo in range(0, len(x), 2048):  # bound the n*k*d temp
                xs = x[lo : lo + 2048]
                d2 = ((xs[:, None, :] - cc[None, :, :]) ** 2).sum(axis=2)
                a = d2.argmin(axis=1)
                counts += np.bincount(a, minlength=k)
                for ci in np.unique(a):
                    sums[ci] += xs[a == ci].sum(axis=0)
            nz = np.flatnonzero(counts)
            yield pd.DataFrame(
                {
                    "cell": np.concatenate(
                        [np.repeat(lbs[nz], d), lbs[nz]]
                    ),
                    "pos": np.concatenate(
                        [np.tile(np.arange(d, dtype=np.int64), nz.size),
                         np.full(nz.size, -1, dtype=np.int64)]
                    ),
                    "v": np.concatenate(
                        [sums[nz].ravel(), counts[nz].astype(np.float64)]
                    ),
                }
            )

    rows = (
        e.select("embedding")
        .mapInPandas(partial, "cell int, pos int, v double")
        .groupBy("cell", "pos")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    sums: dict = {}
    counts: dict = {}
    for r in rows:
        if r.pos < 0:
            counts[r.cell] = r.v
        else:
            sums.setdefault(r.cell, [0.0] * d)[r.pos] = r.v
    return [
        (int(cl), [s / counts[cl] for s in sums[cl]]) for cl in sorted(sums)
    ]


def _ivf_lloyd_cents(spark: SparkSession, sf_dir: str, k: int, iters: int):
    """Deterministic Lloyd training for the IVF coarse quantizer: seeds
    from vec_id 0..k-1, ``iters`` assignment+mean rounds. Only k x 64
    doubles ever reach the driver per round. Memoized per (session,
    sf_dir, k, iters) so every IVF-family operator in a session pays the
    train exactly once."""
    key = (
        "ivf-lloyd",
        getattr(spark.sparkContext, "applicationId", ""),
        sf_dir,
        k,
        iters,
    )
    if key in _IVF_TRAIN_CACHE:
        return _IVF_TRAIN_CACHE[key]
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = [
        (i + 1, [float(x) for x in r.embedding])
        for i, r in enumerate(
            e.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
        )
    ]
    # r14 A/B note: a columnar Catalyst form (64 per-dimension
    # F.sum(element_at) aggregates + count per cell, no posexplode, one
    # fewer shuffle) was measured SLOWER warm at sf0.1 (2.7-3.2s vs
    # 2.0-2.5s for the 3-round train): each round's plan carries fresh
    # centroid literals, so Janino recompiles the 64-buffer HashAggregate
    # codegen every round and the compile cost exceeds the explode
    # savings at this dimensionality. The vectorized `_lloyd_mean_update`
    # sidesteps both costs (no explode, no literals in the plan).
    for _ in range(iters):
        cents = _lloyd_mean_update(spark, e, cents)
    _IVF_TRAIN_CACHE[key] = cents
    return cents


def _ivf_oracle(
    k: int = 8,
    iters: int = 3,
    nprobe: int = 3,
    d: int = _DIM,
    balance: bool = False,
) -> str:
    # Same unrolled-Lloyd trick as the vec_kmeans oracle (deterministic
    # init, fixed rounds), then the probe phase in plain SQL: top-nprobe
    # cells per query (ties to the lower cell, mirroring the tie-safe
    # struct sort in _nearest_cells), equi-join on cell, exact cosine rank.
    def dist2(emb: str, cent: str) -> str:
        return (
            f"list_sum(list_transform(generate_series(1, {d}), i -> "
            f"(CAST({emb}[i] AS DOUBLE) - {cent}[i])"
            f" * (CAST({emb}[i] AS DOUBLE) - {cent}[i])))"
        )

    ctes = [
        "emb AS (SELECT vec_id, embedding FROM embeddings)",
        f"""c0 AS (
      SELECT CAST(vec_id + 1 AS INT) AS cell,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
      FROM embeddings WHERE vec_id < {k})""",
    ]
    for n in range(1, iters + 1):
        ctes.append(f"""a{n} AS (
      SELECT vec_id, embedding, cell FROM (
        SELECT e.vec_id, e.embedding, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist2('e.embedding', 'c.centroid')},
                                           c.cell) AS rk
        FROM emb e CROSS JOIN c{n - 1} c) WHERE rk = 1)""")
        ctes.append(f"""c{n} AS (
      SELECT cell, list(m ORDER BY pos) AS centroid FROM (
        SELECT cell, gs.i AS pos,
               AVG(CAST(a{n}.embedding[gs.i] AS DOUBLE)) AS m
        FROM a{n}, generate_series(1, {d}) gs(i)
        GROUP BY cell, gs.i) GROUP BY cell)""")
    cf = f"c{iters}"
    if balance:
        return f"""
    WITH {','.join(ctes)},
    corpus AS (
      SELECT vec_id AS neighbor_id, embedding AS ce, cell FROM (
        SELECT e.vec_id, e.embedding, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist2('e.embedding', 'c.centroid')},
                                           c.cell) AS rk
        FROM emb e CROSS JOIN {cf} c) WHERE rk = 1)
    SELECT CAST(cell AS INT) AS cell,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (), 6) AS share,
           ROUND(CAST(COUNT(*) AS DOUBLE) * {k} / SUM(COUNT(*)) OVER (), 6)
             AS load_factor
    FROM corpus GROUP BY cell
    """
    return f"""
    WITH {','.join(ctes)},
    corpus AS (
      SELECT vec_id AS neighbor_id, embedding AS ce, cell FROM (
        SELECT e.vec_id, e.embedding, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist2('e.embedding', 'c.centroid')},
                                           c.cell) AS rk
        FROM emb e CROSS JOIN {cf} c) WHERE rk = 1),
    probes AS (
      SELECT vec_id AS query_id, embedding AS qe, cell FROM (
        SELECT e.vec_id, e.embedding, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist2('e.embedding', 'c.centroid')},
                                           c.cell) AS rk
        FROM emb e CROSS JOIN {cf} c
        WHERE e.vec_id < 10) WHERE rk <= {nprobe})
    SELECT query_id, neighbor_id, cos_sim, rk FROM (
      SELECT p.query_id, c.neighbor_id,
             ROUND({_d_cos('p.qe', 'c.ce')}, 6) AS cos_sim,
             ROW_NUMBER() OVER (PARTITION BY p.query_id
                                ORDER BY ROUND({_d_cos('p.qe', 'c.ce')}, 6) DESC,
                                         c.neighbor_id) AS rk
      FROM probes p JOIN corpus c USING (cell)
      WHERE c.neighbor_id != p.query_id) WHERE rk <= 3
    """


@register("sim_ann_ivf", oracle=_ivf_oracle())
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via an IVF (inverted-file) coarse quantizer — the other classic
    100 TB similarity-search rung next to sign-LSH (`sim_ann_lsh`): train k
    centroids with a few Lloyd rounds (only k x 64 doubles ever reach the
    driver), assign every corpus vector to its nearest centroid in ONE
    JVM-side pass (this is the partition/bucketing key a real deployment
    would write the corpus by), then answer each query by probing only the
    `nprobe` nearest cells and ranking exact cosine inside them. Probe cost
    per query is ~(nprobe/k) of the corpus vs LSH's (tables/buckets)
    fraction; recall vs brute force is asserted in
    tests/test_rows_only_quality.py. Training is the shared memoized
    `_ivf_lloyd_cents` (one train per session, shared with
    `sim_ivf_balance`)."""
    k, iters, nprobe = 8, 3, 3
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = _ivf_lloyd_cents(spark, sf_dir, k, iters)
    # self-norms hoisted per ROW (r14, the vec_hubness fix): the probe join
    # evaluates one 64-dim fold (the dot) per (query, cell-mate) pair
    # instead of three — bit-identical cosine, same folds, same division.
    corpus = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        _norm(F.col("embedding")).alias("cn"),
        F.element_at(_ivf_nearest(cents, 1), 1).alias("cell"),
    )
    probes = (
        e.filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            _norm(F.col("embedding")).alias("qn"),
            F.explode(_ivf_nearest(cents, nprobe)).alias("cell"),
        )
    )
    sim = _dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))
    # Rank on the ROUNDED cosine (as sim_topk_matmul does): the unrounded
    # values depend on each engine's fold order for the 64-term dot product,
    # so near-ties could flip the rk<=3 cut between Spark and the oracle.
    # Rounding to 6 places before the window makes rank ties engine-stable;
    # neighbor_id breaks exact ties deterministically on both sides.
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        F.broadcast(probes)
        .join(corpus, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(sim, 6).alias("cos_sim"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


deprioritize("sim_ann_ivf")


@register(
    "dedup_semantic_clusters",
    oracle=f"""
    WITH RECURSIVE jp AS (
      SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE {_d_cos('a.embedding', 'b.embedding')} >= 0.35
    ),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM jp
      UNION ALL SELECT doc_b, doc_a FROM jp
    ),
    nodes AS (SELECT DISTINCT u AS node FROM edges),
    reach(node, r) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.u, rc.r FROM edges e JOIN reach rc ON rc.node = e.v
    ),
    labels AS (SELECT node, MIN(r) AS comp FROM reach GROUP BY node)
    SELECT comp, CAST(COUNT(*) AS BIGINT) AS cluster_size,
           MIN(node) AS keep_id
    FROM labels GROUP BY comp HAVING COUNT(*) > 1
    """,
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC dedup end to end: the embedding-cosine near-dup pair graph
    (label-blocked, cos >= 0.35 — dedup_embed_cosine's exact pair set)
    closed into connected components by the shared label-propagation loop
    (llm_text._label_propagate), yielding one canonical id per cluster of
    transitively-similar items. This is the pipeline that catches
    paraphrase-level duplicates exact/minhash dedup cannot: A~B and B~C
    collapse to one kept item even when A and C are not directly similar.

    Scale: pairs ∝ block occupancy (IVF/LSH cells at corpus scale, label
    here); propagation is O(diameter) rounds of join+groupBy with
    per-round lineage cuts, raising if 20 rounds pass unconverged —
    identical posture to the text-side dedup_components. Oracle: the
    same closure as a recursive CTE."""
    from .llm_text import _label_propagate

    e = load(spark, sf_dir, "embeddings")
    pairs = (
        dedup_embed_cosine(spark, sf_dir)
        .select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    )
    _, labels = _label_propagate(pairs, e.select(F.col("vec_id").alias("doc_id")))
    return (
        labels.groupBy("comp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cluster_size"),
            F.min("doc_id").alias("keep_id"),
        )
        .filter(F.col("cluster_size") > 1)
    )


@register(
    "vec_truncate_mrl",
    oracle="""
    WITH e AS (
      SELECT label,
             list_sum(list_transform(embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS full_e,
             list_sum(list_transform(embedding[1:16],
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS head_e
      FROM embeddings
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(head_e / full_e), 6) AS avg_energy_16,
           ROUND(MIN(head_e / full_e), 6) AS min_energy_16,
           ROUND(AVG(sqrt(head_e) / sqrt(full_e)), 6) AS avg_norm_ratio
    FROM e GROUP BY label
    """,
)
def vec_truncate_mrl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation analysis: how much of each embedding's
    energy (squared L2 mass) survives keeping only the first 16 of 64
    dims — the measurement behind MRL-style dimension reduction (truncate
    + renormalize, trading recall for 4x less storage/compute in the ANN
    index). Reports per-label mean/min energy fraction and the norm
    ratio; a label whose min is low is unsafe to serve truncated.

    Scale: pure array-lambda math per row (zip-free: two list_sum folds),
    one partial-agg shuffle over O(labels) groups — the same profile as
    vec_norm_stats. The follow-on (actually truncating + re-bucketing
    the IVF index on 16-dim centroids) reuses sim_ann_ivf unchanged."""
    e = load(spark, sf_dir, "embeddings")
    sq = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
    )
    full_e = sq(F.col("embedding"))
    head_e = sq(F.slice(F.col("embedding"), 1, 16))
    base = e.select("label", full_e.alias("full_e"), head_e.alias("head_e"))
    frac = F.col("head_e") / F.col("full_e")
    return base.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg(frac), 6).alias("avg_energy_16"),
        F.round(F.min(frac), 6).alias("min_energy_16"),
        F.round(F.avg(F.sqrt(F.col("head_e")) / F.sqrt(F.col("full_e"))), 6).alias(
            "avg_norm_ratio"
        ),
    )


def _ann_recall_oracle() -> str:
    # composition: reuse the EXACT registered oracles of the two ANN
    # queries as derived tables (DuckDB allows WITH inside a subquery), so
    # this oracle can never drift from theirs
    from ..registry import all_oracles

    o = all_oracles()
    # recall@3, NOT @5: sim_ann_lsh returns top-3 neighbors, so the
    # denominator must be the rank depth BOTH sides produce — dividing
    # the 5-deep ground truth by 5 would cap a perfect index at 0.6
    return f"""
    SELECT b.query_id,
           CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_matched,
           ROUND(COUNT(l.neighbor_id) / 3.0, 6) AS recall_at_3
    FROM (SELECT * FROM ({o["sim_topk_bruteforce"]}) t WHERE t.rk <= 3) b
    LEFT JOIN ({o["sim_ann_lsh"]}) l
      ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
    GROUP BY b.query_id
    """


@register("sim_ann_recall_eval", oracle=_ann_recall_oracle())
def sim_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVALUATION AS AN OPERATOR: recall@3 of the LSH ANN index against
    the brute-force ground truth, per query (3 = the rank depth the LSH
    query serves; a deeper denominator would structurally cap the
    metric) — the measurement loop every
    ANN deployment runs continuously (index drift, new data, parameter
    changes all move recall; pytest asserts >=0.9 once, this makes the
    metric a first-class query you can schedule). Composes the two
    REGISTERED queries — and their registered oracles verbatim as derived
    tables — so the evaluation can never drift from what it evaluates.

    Scale: ground truth on a SAMPLE of queries (here vec_id < 3) is the
    standard practice — brute force over the sample costs one corpus
    scan; the join/aggregate is O(sample x k)."""
    bf = (
        sim_topk_bruteforce(spark, sf_dir)
        .filter(F.col("rk") <= 3)
        .select("query_id", F.col("neighbor_id").alias("bf_neighbor"))
    )
    lsh = sim_ann_lsh(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("lsh_neighbor")
    )
    j = bf.join(
        lsh,
        (bf.query_id == lsh.query_id) & (F.col("bf_neighbor") == F.col("lsh_neighbor")),
        "left",
    )
    return j.groupBy(bf.query_id.alias("query_id")).agg(
        F.count("lsh_neighbor").cast("long").alias("n_matched"),
        F.round(F.count("lsh_neighbor") / 3.0, 6).alias("recall_at_3"),
    )



# ---------------------------------------------------------------------------
# Product quantization (PQ): codebook training + asymmetric-distance ANN
# ---------------------------------------------------------------------------

_PQ_M, _PQ_SUB, _PQ_K = 8, 8, 4  # 8 subspaces x 8 dims, 4 codes each


def _pq_sql_dist2(v: str, cent: str, sub: int = _PQ_SUB) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {sub}), i -> "
        f"({v}[i] - {cent}[i]) * ({v}[i] - {cent}[i])))"
    )


def _pq_ctes(m: int = _PQ_M, sub: int = _PQ_SUB, k: int = _PQ_K) -> str:
    """Shared oracle CTE chain: subspace split -> seed codebook -> 2
    unrolled Lloyd rounds keyed on (subspace, code), stable labels through
    emptied cells (same trick as the vec_kmeans oracle, jointly over all
    subspaces). Ends with a2 (final assignments) and c1 (the codebook a2
    was assigned against)."""
    d = _pq_sql_dist2
    return f"""sv AS (
      SELECT vec_id, s.s AS subspace,
             list_transform(generate_series(1, {sub}),
                            i -> CAST(embedding[s.s * {sub} + i] AS DOUBLE)) AS v
      FROM embeddings, generate_series(0, {m - 1}) s(s)
    ),
    c0 AS (
      SELECT subspace, CAST(vec_id + 1 AS INT) AS code, v AS centroid
      FROM sv WHERE vec_id < {k}
    ),
    a1 AS (
      SELECT vec_id, subspace, v, code FROM (
        SELECT sv.vec_id, sv.subspace, sv.v, c.code,
               ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.subspace
                                  ORDER BY {d('sv.v', 'c.centroid')},
                                           c.code) AS rk
        FROM sv JOIN c0 c USING (subspace)) WHERE rk = 1
    ),
    c1 AS (
      SELECT subspace, code, list(mu ORDER BY pos) AS centroid FROM (
        SELECT subspace, code, gs.i AS pos, AVG(v[gs.i]) AS mu
        FROM a1, generate_series(1, {sub}) gs(i)
        GROUP BY subspace, code, gs.i) GROUP BY subspace, code
    ),
    a2 AS (
      SELECT vec_id, subspace, v, code FROM (
        SELECT sv.vec_id, sv.subspace, sv.v, c.code,
               ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.subspace
                                  ORDER BY {d('sv.v', 'c.centroid')},
                                           c.code) AS rk
        FROM sv JOIN c1 c USING (subspace)) WHERE rk = 1
    )"""


def _pq_oracle() -> str:
    return f"""
    WITH {_pq_ctes()}
    SELECT subspace, code, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG({_pq_sql_dist2('a.v', 'c.centroid')}), 6) AS avg_dist2
    FROM a2 a JOIN c1 c USING (subspace, code)
    GROUP BY subspace, code
    """


def _pq_ann_oracle(nq: int = 5, topk: int = 5) -> str:
    # ADC: per-query lookup table against the trained codebook, approximate
    # distance = sum of per-subspace table entries for the vector's codes.
    # Rank on ROUND(·, 6): the 8-term sum folds in different orders across
    # engines (~1e-13 noise).
    return f"""
    WITH {_pq_ctes()},
    q AS (SELECT vec_id AS query_id, subspace, v FROM sv WHERE vec_id < {nq}),
    lut AS (
      SELECT q.query_id, c.subspace, c.code,
             {_pq_sql_dist2('q.v', 'c.centroid')} AS d
      FROM q JOIN c1 c ON c.subspace = q.subspace
    ),
    adist AS (
      SELECT l.query_id, e.vec_id, SUM(l.d) AS ad
      FROM a2 e JOIN lut l ON l.subspace = e.subspace AND l.code = e.code
      GROUP BY l.query_id, e.vec_id
    )
    SELECT query_id, vec_id AS neighbor_id, ROUND(ad, 6) AS pq_dist2, rk FROM (
      SELECT query_id, vec_id, ad,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY ROUND(ad, 6), vec_id) AS rk
      FROM adist WHERE vec_id != query_id) t
    WHERE rk <= {topk}
    """


from ..tables import register_aux_cache

# registered so tables.clear_cache() stays the ONE reset path (same leak
# class the r5 review fixed for _TRI_EDGE_CACHE)
_PQ_FIT_CACHE: dict = register_aux_cache({})


def _pq_subvectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {_PQ_M - 1}), s -> "
                f"transform(slice(embedding, s * {_PQ_SUB} + 1, {_PQ_SUB}), "
                "x -> CAST(x AS DOUBLE)))"
            )
        ).alias("subspace", "v"),
    )


def _pq_cent_literal(cents: dict):
    """All m*k centroids as ONE literal: array indexed by subspace of
    arrays of struct(code, cent). Codes with emptied cells are absent,
    keeping labels stable (mirrors the oracle's join-through-c1)."""
    per_sub = []
    for s in range(_PQ_M):
        entries = sorted((code, c) for (s2, code), c in cents.items() if s2 == s)
        per_sub.append(
            F.array(
                *[
                    F.struct(
                        F.lit(code).alias("code"),
                        F.array(*[F.lit(x) for x in c]).alias("cent"),
                    )
                    for code, c in entries
                ]
            )
        )
    return F.array(*per_sub)


def _pq_dist2(cent):
    return F.aggregate(
        F.zip_with(F.col("v"), cent, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )


def _pq_assign(sv: DataFrame, cents: dict) -> DataFrame:
    """Zero-shuffle assignment map: element_at the centroid literal by
    subspace, then the single-evaluation struct-argmin (ties -> lowest
    code, matching the oracle's ORDER BY dist, code)."""
    row_cents = F.element_at(_pq_cent_literal(cents), F.col("subspace") + 1)
    return sv.select(
        "vec_id",
        "subspace",
        "v",
        F.array_min(
            F.transform(
                row_cents,
                lambda c: F.struct(
                    _pq_dist2(c["cent"]).alias("d"), c["code"].alias("code")
                ),
            )
        )["code"].alias("code"),
    )


def _pq_fit(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, dict]:
    """Seeds from vec_id 0..k-1, ONE Lloyd update (the oracle's c1); the
    caller assigns against the returned codebook for the second, final
    round. Memoized per (session, sf_dir): training collects only
    m*k*sub = 256 doubles. Returns (sub-vector frame, codebook dict)."""
    try:
        key = (spark.sparkContext.applicationId, sf_dir)
    except Exception:
        key = ("", sf_dir)
    sv = _pq_subvectors(spark, sf_dir)
    if key in _PQ_FIT_CACHE:
        return sv, _PQ_FIT_CACHE[key]
    seeds = sv.filter(F.col("vec_id") < _PQ_K).collect()
    cents = {
        (int(r.subspace), int(r.vec_id) + 1): [float(x) for x in r.v] for r in seeds
    }
    updated = (
        _pq_assign(sv, cents)
        .select("subspace", "code", F.posexplode("v").alias("pos", "val"))
        .groupBy("subspace", "code", "pos")
        .agg(F.avg("val").alias("mu"))
        .groupBy("subspace", "code")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mu"))).alias("pm"))
        .select("subspace", "code", F.col("pm.mu").alias("cent"))
        .collect()
    )
    cents = {
        (int(r.subspace), int(r.code)): [float(x) for x in r.cent] for r in updated
    }
    _PQ_FIT_CACHE[key] = cents
    return sv, cents


@register("vec_pq_train", oracle=_pq_oracle())
def vec_pq_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codebook training: split each 64-dim embedding
    into m=8 subspaces of 8 dims, run k=4 Lloyd's k-means in EVERY
    subspace jointly (2 fixed rounds, seeds = vec_id 0..3's sub-vectors),
    and report each (subspace, code) cell's population and quantization
    error. PQ is the memory backbone of serving-scale ANN: 8 one-byte
    codes replace 64 floats (32x).

    Spark-first shape: the subspace split is a JVM transform+posexplode
    (one row per (vec, subspace)); every Lloyd round assigns via a
    BROADCAST LITERAL of all m*k centroids (element_at by subspace, then
    the same single-evaluation struct-argmin as vec_kmeans — no join, no
    shuffle in the assignment map) and updates with one groupBy(subspace,
    code, pos). Only 256 doubles ever reach the driver per round. The
    final pass scores against the round-1 centroids — exactly the
    oracle's a2-join-c1 frame."""
    sv, cents = _pq_fit(spark, sf_dir)
    a2 = _pq_assign(sv, cents)
    row_cents = F.element_at(_pq_cent_literal(cents), F.col("subspace") + 1)
    own = F.element_at(
        F.filter(row_cents, lambda c: c["code"] == F.col("code")), 1
    )["cent"]
    return a2.groupBy("subspace", "code").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg(_pq_dist2(own)), 6).alias("avg_dist2"),
    )


@register("sim_ann_pq", oracle=_pq_ann_oracle())
def sim_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k search: encode the corpus as 8
    one-byte codes, precompute each query's 8x4 lookup table of exact
    query-sub-vector -> centroid distances, and score every corpus vector
    as the SUM of 8 table entries selected by its codes — the serving
    data path of FAISS-style IVF-PQ indexes, where the corpus never
    touches float vectors at query time.

    Spark-first shape: encoding is the zero-shuffle literal-broadcast
    argmin (shared trainer with vec_pq_train — one codebook per session);
    the query LUTs are a 5x8x4-entry nested map LITERAL built driver-side
    from 5 collected query vectors (bounded: 160 doubles), so scoring is
    a narrow map — per corpus vector, 8 map lookups and an 8-term fold,
    no join, no float vectors read. The only shuffle is the final per-
    query WindowGroupLimit top-k. Ranks compare on ROUND(·, 6) because
    the 8-term sum folds in engine-specific order."""
    nq, topk = 5, 5
    sv, cents = _pq_fit(spark, sf_dir)
    a2 = _pq_assign(sv, cents)
    encoded = (
        a2.groupBy("vec_id")
        .agg(F.array_sort(F.collect_list(F.struct("subspace", "code"))).alias("sc"))
        .select("vec_id", F.col("sc.code").alias("codes"))
    )
    queries = {
        (int(r.vec_id), int(r.subspace)): [float(x) for x in r.v]
        for r in sv.filter(F.col("vec_id") < nq).collect()
    }
    qids = sorted({q for q, _ in queries})

    def d2(a: list, b: list) -> float:
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    luts = F.array(
        *[
            F.array(
                *[
                    F.create_map(
                        *[
                            lit
                            for (s2, code), cent in sorted(cents.items())
                            if s2 == s
                            for lit in (
                                F.lit(code),
                                F.lit(d2(queries[(q, s)], cent)),
                            )
                        ]
                    )
                    for s in range(_PQ_M)
                ]
            )
            for q in qids
        ]
    )
    qdf = spark.range(len(qids)).select(
        (F.col("id") + 1).cast("int").alias("qidx"),
        F.element_at(F.array(*[F.lit(q) for q in qids]), (F.col("id") + 1).cast("int"))
        .cast("long")
        .alias("query_id"),
    )
    adist = F.aggregate(
        F.sequence(F.lit(0), F.lit(_PQ_M - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(F.element_at(luts, F.col("qidx")), s + 1),
            F.element_at(F.col("codes"), s + 1),
        ),
    )
    scored = (
        encoded.crossJoin(F.broadcast(qdf))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), adist.alias("ad"))
    )
    w = Window.partitionBy("query_id").orderBy(F.round(F.col("ad"), 6), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= topk)
        .select("query_id", "neighbor_id", F.round("ad", 6).alias("pq_dist2"), "rk")
    )


# ---------------------------------------------------------------------------
# MMR diversified re-ranking (round 6)
# ---------------------------------------------------------------------------
_MMR_LAMBDA = 0.7
_MMR_K = 4      # greedy selections per query
_MMR_TOPN = 10  # relevance shortlist per query
_MMR_NQ = 3     # query vectors: vec_id < 3


def _mmr_oracle() -> str:
    lam, om = _MMR_LAMBDA, round(1 - _MMR_LAMBDA, 10)
    steps = []
    for t in range(1, _MMR_K + 1):
        if t == 1:
            prev_all = None
            ms = f"""
    ms1 AS MATERIALIZED (
      SELECT query_id, cand_id, 0.0e0 AS max_sim FROM cand
    )"""
        else:
            prev_all = " UNION ALL ".join(
                f"SELECT query_id, cand_id FROM sel{j}" for j in range(1, t)
            )
            ms = f"""
    selall{t} AS MATERIALIZED ({prev_all}),
    ms{t} AS MATERIALIZED (
      SELECT c.query_id, c.cand_id, MAX(p.sim) AS max_sim
      FROM cand c
      LEFT JOIN selall{t} d
        ON d.query_id = c.query_id AND d.cand_id = c.cand_id
      JOIN selall{t} s ON s.query_id = c.query_id
      JOIN pair p ON p.query_id = c.query_id
                 AND p.c1 = c.cand_id AND p.c2 = s.cand_id
      WHERE d.cand_id IS NULL
      GROUP BY 1, 2
    )"""
        steps.append(
            ms
            + f""",
    sel{t} AS MATERIALIZED (
      SELECT query_id, cand_id, {t} AS rk, mmr_micro FROM (
        SELECT c.query_id, c.cand_id,
               CAST(FLOOR(({lam}e0 * c.rel - {om}e0 * m.max_sim) * 1000000)
                    AS BIGINT) AS mmr_micro,
               ROW_NUMBER() OVER (
                 PARTITION BY c.query_id
                 ORDER BY FLOOR(({lam}e0 * c.rel - {om}e0 * m.max_sim) * 1000000)
                            DESC,
                          c.cand_id) AS rn
        FROM cand c JOIN ms{t} m
          ON m.query_id = c.query_id AND m.cand_id = c.cand_id
      ) x WHERE rn = 1
    )"""
        )
    union = " UNION ALL ".join(f"SELECT * FROM sel{t}" for t in range(1, _MMR_K + 1))
    return f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
      WHERE vec_id < {_MMR_NQ}
    ),
    cand AS MATERIALIZED (
      SELECT * FROM (
        SELECT q.query_id, c.vec_id AS cand_id, c.embedding AS c_emb,
               ROUND({_d_cos('q.q_emb', 'c.embedding')}, 6) AS rel,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {_d_cos('q.q_emb', 'c.embedding')} DESC, c.vec_id) AS rn
        FROM q CROSS JOIN embeddings c WHERE c.vec_id != q.query_id
      ) t WHERE rn <= {_MMR_TOPN}
    ),
    pair AS MATERIALIZED (
      SELECT a.query_id, a.cand_id AS c1, b.cand_id AS c2,
             {_d_cos('a.c_emb', 'b.c_emb')} AS sim
      FROM cand a JOIN cand b
        ON a.query_id = b.query_id AND a.cand_id != b.cand_id
    ),{",".join(steps)}
    SELECT query_id, cand_id, rk,
           CAST(mmr_micro AS DOUBLE) / 1000000 AS mmr FROM ({union}) z
    """


@register("sim_mmr_rerank", oracle=_mmr_oracle())
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
    greedily pick {_MMR_K} of each query's top-{_MMR_TOPN} cosine
    candidates, each step maximizing lambda*relevance -
    (1-lambda)*max-similarity-to-already-selected — the standard
    diversity re-ranker between ANN retrieval and a RAG context window.

    Greedy selection is inherently sequential, but each step is a
    CONSTANT-SIZE relational operation over the per-query shortlist
    ({_MMR_TOPN} rows/query): the {_MMR_K} steps unroll statically into
    one Catalyst plan (anti-join to drop already-selected, max-sim
    aggregate against the selected set, ROUND-6 argmax window with
    cand_id tie-break), exactly like the unrolled Lloyd/peel rounds
    elsewhere in this repo. At 100 TB the shortlists come from the ANN
    family (IVF/PQ/binary) and MMR cost stays O(queries * k * topn) —
    independent of corpus size. The oracle unrolls the same steps with
    MATERIALIZED CTEs."""
    e = load(spark, sf_dir, "embeddings")
    # self-norms hoisted per ROW in the relevance scan (r14): one fold per
    # (query, candidate) pair instead of three — bit-identical cosine.
    q = e.filter(F.col("vec_id") < _MMR_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        _norm(F.col("embedding")).alias("q_n"),
    )
    rel = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_n") * F.col("c_n")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rel_raw").desc(), "cand_id")
    cand = (
        F.broadcast(q)
        .crossJoin(
            e.select(
                F.col("vec_id").alias("cand_id"),
                "embedding",
                _norm(F.col("embedding")).alias("c_n"),
            )
        )
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id", "cand_id", F.col("embedding").alias("c_emb"),
            rel.alias("rel_raw"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _MMR_TOPN)
        .select("query_id", "cand_id", "c_emb", F.round("rel_raw", 6).alias("rel"))
        # the shortlist (queries x topn rows) feeds the pair self-join AND
        # every greedy step — cut its lineage once so the crossJoin+window
        # scan runs a single time instead of once per unrolled reference
        .localCheckpoint(eager=True)
    )
    a, b = cand.alias("a"), cand.alias("b")
    pair = a.join(
        b,
        (F.col("a.query_id") == F.col("b.query_id"))
        & (F.col("a.cand_id") != F.col("b.cand_id")),
    ).select(
        F.col("a.query_id").alias("query_id"),
        F.col("a.cand_id").alias("c1"),
        F.col("b.cand_id").alias("c2"),
        _cos(F.col("a.c_emb"), F.col("b.c_emb")).alias("sim"),
    )
    lam, om = _MMR_LAMBDA, 1 - _MMR_LAMBDA
    slim = cand.select("query_id", "cand_id", "rel")

    # Greedy selection as ONE cogrouped Arrow task per query shard (r14):
    # the r7-r13 shape unrolled the K steps into Catalyst (per step an
    # anti-join + selected-join + max agg + rank window + eager lineage
    # cut — ~4 jobs/step of machinery over topn rows/query). Every number
    # the greedy loop consumes (rel: ROUND-6; sim: the raw pair cosine) is
    # STILL computed by the same Spark expressions above and crosses to
    # Arrow bit-identically; the loop itself is scalar IEEE arithmetic
    # (multiply, subtract, floor, max over a set) with no fold-order
    # freedom, so selections are bit-exact vs the unrolled plan — and the
    # floor-to-micro grid + ascending-cand_id strict-improvement scan
    # reproduce the rank window's (mmr_micro DESC, cand_id) tie-break
    # exactly. At 100 TB the shortlists shard by query_id; per-shard work
    # stays O(k * topn^2) regardless of corpus size (guide §4.2).
    import math

    def _greedy(left, right):
        import pandas as pd

        if not len(left):
            return pd.DataFrame(
                {"query_id": [], "cand_id": [], "rk": [], "mmr": []}
            ).astype({"query_id": "int64", "cand_id": "int64", "rk": "int32",
                      "mmr": "float64"})
        qid = int(left["query_id"].iloc[0])
        rel = dict(zip(left["cand_id"].astype("int64"), left["rel"]))
        sim = {
            (int(c1), int(c2)): s
            for c1, c2, s in zip(right["c1"], right["c2"], right["sim"])
        }
        selected: list[int] = []
        out_id, out_rk, out_mmr = [], [], []
        remaining = set(rel)
        for t in range(1, _MMR_K + 1):
            best_id, best_mm = None, None
            for cid in sorted(remaining):
                max_sim = max((sim[(cid, s)] for s in selected), default=0.0)
                mm = math.floor((lam * rel[cid] - om * max_sim) * 1000000)
                if best_mm is None or mm > best_mm:
                    best_id, best_mm = cid, mm
            selected.append(best_id)
            remaining.discard(best_id)
            out_id.append(best_id)
            out_rk.append(t)
            out_mmr.append(float(best_mm) / 1000000)
        return pd.DataFrame(
            {
                "query_id": [qid] * len(out_id),
                "cand_id": out_id,
                "rk": out_rk,
                "mmr": out_mmr,
            }
        ).astype({"query_id": "int64", "cand_id": "int64", "rk": "int32",
                  "mmr": "float64"})

    return (
        slim.groupby("query_id")
        .cogroup(pair.groupby("query_id"))
        .applyInPandas(
            _greedy, "query_id long, cand_id long, rk int, mmr double"
        )
    )


# ---------------------------------------------------------------------------
# Power-iteration leading eigenvector (round 6)
# ---------------------------------------------------------------------------
_PI_ROUNDS = 8


def _power_iter_oracle() -> str:
    rounds = []
    for t in range(1, _PI_ROUNDS + 1):
        rounds.append(f"""
    w{t} AS MATERIALIZED (
      SELECT c.i, SUM(c.c * v.val) AS w
      FROM cov c JOIN v{t - 1} v ON v.j = c.j GROUP BY c.i
    ),
    n{t} AS MATERIALIZED (SELECT sqrt(SUM(w * w)) AS nrm FROM w{t}),
    v{t} AS MATERIALIZED (
      SELECT i AS j, w / nrm AS val FROM w{t} CROSS JOIN n{t}
    )""")
    return f"""
    WITH comps AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings
    ),
    mu AS MATERIALIZED (SELECT i, AVG(x) AS m FROM comps GROUP BY i),
    cov AS MATERIALIZED (
      SELECT a.i AS i, b.i AS j,
             AVG(a.x * b.x) - ma.m * mb.m AS c
      FROM comps a
      JOIN comps b ON a.vec_id = b.vec_id
      JOIN mu ma ON ma.i = a.i
      JOIN mu mb ON mb.i = b.i
      GROUP BY a.i, b.i, ma.m, mb.m
    ),
    v0 AS (SELECT unnest(generate_series(1, {_DIM})) AS j, 1.0e0 AS val),
    {",".join(rounds)}
    SELECT v.j AS component, ROUND(v.val, 6) AS loading,
           ROUND(n.nrm, 6) AS eigenvalue
    FROM v{_PI_ROUNDS} v CROSS JOIN n{_PI_ROUNDS} n
    """


def cov_gram_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized distributed Gram/mean reduce over the embeddings corpus:
    one (i, j, v, n) row per Gram cell (v = sum_x x_i * x_j) plus the
    per-dimension sum rows flagged i = -1 — everything a consumer needs to
    form the d x d covariance. Each Arrow batch contributes its partial
    X^T X via one BLAS GEMM inside ``mapInPandas``; a single d^2-row
    groupBy reduces the partials, so the shuffle is O(batches * d^2)
    regardless of corpus size.

    Shared by ``vec_power_iteration`` and ``vec_pca_evr`` (r14): both keys
    consume the SAME covariance, and before this helper each ran its own
    full corpus pass in one session — a duplicated subtree across keys
    (guide §1.2), ~2-4s of first-invocation machinery per key at sf0.1 and
    a duplicated full-data pass at any scale. The reduced frame is d^2 + d
    rows, persisted per (applicationId, sf_dir) in the aux-cache registry
    (freed by ``tables.clear_cache``; fresh driver/oracle sessions build it
    from parquet every run — nothing survives a process)."""
    import numpy as np
    import pandas as pd

    key = ("cov_parts", getattr(spark.sparkContext, "applicationId", ""), sf_dir)
    cov = _PQ_FIT_CACHE.get(key)
    if cov is None:
        e = load(spark, sf_dir, "embeddings").select("embedding")

        def partial_gram(batches):
            for pdf in batches:
                x = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
                )
                if not len(x):
                    continue
                g = x.T @ x
                i, j = np.indices(g.shape)
                yield pd.DataFrame(
                    {
                        "i": np.append(i.ravel(), np.full(x.shape[1], -1)),
                        "j": np.append(j.ravel(), np.arange(x.shape[1])),
                        "v": np.append(g.ravel(), x.sum(axis=0)),
                        "n": np.append(
                            np.zeros(g.size, dtype=np.int64),
                            np.full(x.shape[1], len(x), dtype=np.int64),
                        ),
                    }
                )

        cov = (
            e.mapInPandas(partial_gram, "i int, j int, v double, n long")
            .groupBy("i", "j")
            .agg(F.sum("v").alias("v"), F.sum("n").alias("n"))
            .persist()
        )
        _PQ_FIT_CACHE[key] = cov
    return cov


@register("vec_power_iteration", oracle=_power_iter_oracle())
def vec_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading covariance eigenvector via {_PI_ROUNDS} power-iteration
    rounds: v_t+1 = normalize(C v_t) from an all-ones start, eigenvalue =
    the final pre-normalization norm (||C v|| for unit v).

    Shape (r14): the only data-sized pass is the Gram/mean reduce — each
    Arrow batch contributes its d x d partial X^T X (one BLAS GEMM) plus
    per-dimension sums, reduced by one d^2-row groupBy (the vec_pca_evr
    pattern; at 100 TB this is the standard distributed Gram reduce, and
    the shuffle is O(batches * d^2) regardless of corpus size). The
    iteration itself is O(d^2) work on a d x d matrix, far below any
    distribution threshold, so it runs vectorized (numpy matvec) inside
    ONE executor task over the single coalesced cov partition — nothing
    ever reaches the driver, and the 8 rounds cost one stage instead of
    the r10-r13 relational unroll's 8 joins + 8 aggregates + 3 lineage
    cuts (~20 jobs, ~2.5s of pure machinery at sf0.1). Fold-order noise
    vs the oracle's relational sums is absorbed by ROUND(6), exactly as
    it already was for the JVM partial aggregates; the final rounding is
    Spark's own ROUND so both engines keep half-up decimal semantics."""
    import numpy as np
    import pandas as pd

    cov = cov_gram_parts(spark, sf_dir)

    def power_rounds(batches):
        rows = pd.concat(list(batches), ignore_index=True)
        d = _DIM
        ii = rows["i"].to_numpy()
        jj = rows["j"].to_numpy()
        vv = rows["v"].to_numpy()
        gram = np.zeros((d, d))
        mean_sum = np.zeros(d)
        mask = ii >= 0
        gram[ii[mask], jj[mask]] = vv[mask]
        mean_sum[jj[~mask]] = vv[~mask]
        n = int(rows["n"].to_numpy()[~mask].max())
        mu = mean_sum / n
        c = gram / n - np.outer(mu, mu)
        v = np.ones(d)
        nrm = 0.0
        for _ in range(_PI_ROUNDS):
            w = c @ v
            nrm = float(np.sqrt(float(w @ w)))
            v = w / nrm
        yield pd.DataFrame(
            {
                "component": np.arange(1, d + 1, dtype=np.int32),
                "loading": v,
                "eigenvalue": np.full(d, nrm),
            }
        )

    # coalesce(1): the reduced cov is d^2 + d rows — one task holds the
    # whole matrix with no extra exchange (coalesce is narrow over the
    # aggregate's 8 post-shuffle partitions)
    return (
        cov.coalesce(1)
        .mapInPandas(power_rounds, "component int, loading double, eigenvalue double")
        .select(
            "component",
            F.round("loading", 6).alias("loading"),
            F.round("eigenvalue", 6).alias("eigenvalue"),
        )
    )


# ---------------------------------------------------------------------------
# ColBERT-style late-interaction MaxSim (round 7)
# ---------------------------------------------------------------------------
_MS_SUBS, _MS_SUBDIM = 4, 16   # 64-dim vectors viewed as 4 sub-vectors of 16
_MS_NQUERY, _MS_NCAND, _MS_TOPK = 3, 200, 5


def _ms_dot(a: str, b: str, sa: int, sb: int, one_based: bool) -> str:
    """Fully-unrolled 16-term sub-vector dot product — literal indices and
    left-to-right addition, so both engines execute the identical float
    expression tree (the cross-engine-exactness convention)."""
    off = 1 if one_based else 0
    terms = [
        f"CAST({a}[{sa * _MS_SUBDIM + i + off}] AS DOUBLE)"
        f" * CAST({b}[{sb * _MS_SUBDIM + i + off}] AS DOUBLE)"
        for i in range(_MS_SUBDIM)
    ]
    return "(" + " + ".join(terms) + ")"


def _ms_score(qa: str, qb: str, one_based: bool) -> str:
    """MaxSim: sum over query sub-vectors of the max cosine against any
    candidate sub-vector (max is order-exact; the outer sum is a fixed
    left-to-right 4-term chain)."""
    fn_max = "greatest" if not one_based else "greatest"
    parts = []
    for sa in range(_MS_SUBS):
        coss = [
            f"({_ms_dot(qa, qb, sa, sb, one_based)}"
            f" / (sqrt({_ms_dot(qa, qa, sa, sa, one_based)})"
            f" * sqrt({_ms_dot(qb, qb, sb, sb, one_based)})))"
            for sb in range(_MS_SUBS)
        ]
        parts.append(f"{fn_max}({', '.join(coss)})")
    return "(" + " + ".join(parts) + ")"


@register(
    "sim_maxsim_late_interaction",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
               WHERE vec_id < {_MS_NQUERY}),
    c AS (SELECT vec_id, embedding AS ce FROM embeddings
          WHERE vec_id >= {_MS_NQUERY} AND vec_id < {_MS_NQUERY + _MS_NCAND}),
    scored AS (
      SELECT q.query_id, c.vec_id,
             ROUND({_ms_score("qe", "ce", True)}, 6) AS maxsim
      FROM q CROSS JOIN c
    )
    SELECT query_id, vec_id, maxsim, CAST(rk AS INT) AS rk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY maxsim DESC, vec_id) AS rk
          FROM scored) t
    WHERE rk <= {_MS_TOPK}
    """,
)
def sim_maxsim_late_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late-interaction retrieval (Khattab & Zaharia 2020):
    instead of one dot product per (query, doc), every query sub-vector
    scores against every candidate sub-vector and takes its best match —
    score = sum over query parts of max cosine. Here the fixture's 64-dim
    embeddings are viewed as {_MS_SUBS} sub-vectors of {_MS_SUBDIM} dims
    (the multi-vector layout; a real ColBERT stores per-token vectors in
    an array column of exactly this shape), top-{_MS_TOPK} per query.

    Plan: tiny query side broadcast against the candidate set, all
    {_MS_SUBS}x{_MS_SUBS} sub-cosines statically unrolled as literal
    Catalyst expressions (identical float expression tree in the DuckDB
    oracle — max is order-exact, sums are fixed 4/16-term chains), rank
    via per-query WindowGroupLimit. At 100 TB the candidate set comes
    from a first-stage ANN shortlist (sim_ann_* here), and MaxSim
    re-ranks the shortlist — this operator IS that re-rank stage, and
    stays a narrow projection + small window over shortlist-sized data."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _MS_NQUERY).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = e.filter(
        (F.col("vec_id") >= _MS_NQUERY) & (F.col("vec_id") < _MS_NQUERY + _MS_NCAND)
    ).select("vec_id", F.col("embedding").alias("ce"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .withColumn("maxsim", F.round(F.expr(_ms_score("qe", "ce", False)), 6))
        .select("query_id", "vec_id", "maxsim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("maxsim").desc(), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _MS_TOPK)
        .select("query_id", "vec_id", "maxsim", F.col("rk").cast("int").alias("rk"))
    )


# ---------------------------------------------------------------------------
# IVF list-balance audit (round 8)
# ---------------------------------------------------------------------------


@register("sim_ivf_balance", oracle=_ivf_oracle(balance=True))
def sim_ivf_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index health metrology — the occupancy audit a vector-search
    deployment runs after training `sim_ann_ivf`'s coarse quantizer: per
    inverted list the vector count, corpus share, and load factor
    (n * k / total; 1.0 = perfectly balanced). A hot cell (load >> 1)
    means probe latency skew and a recall cliff on its queries — the
    fix is re-training with more centroids or splitting the hot cell,
    and THIS measurement is what triggers it (the IVF sibling of
    `dedup_lsh_recall`'s banding audit).

    Same deterministic 3-round Lloyd training and stable-label assignment
    as `sim_ann_ivf` — literally the same trained centroids via the
    memoized `_ivf_lloyd_cents` (one train per session across the IVF
    family); only the final reduction differs — one partial-agg groupBy
    on the cell id, so the audit costs one O(cells) shuffle past the
    assignment scan that the index build already pays."""
    k, iters = 8, 3
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = _ivf_lloyd_cents(spark, sf_dir, k, iters)
    corpus = e.select(F.element_at(_ivf_nearest(cents, 1), 1).alias("cell"))
    per = corpus.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors")
    )
    tot = per.agg(F.sum("n_vectors").cast("double").alias("total"))
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("cell").cast("int").alias("cell"),
        "n_vectors",
        F.round(F.col("n_vectors").cast("double") / F.col("total"), 6).alias(
            "share"
        ),
        F.round(
            F.col("n_vectors").cast("double") * k / F.col("total"), 6
        ).alias("load_factor"),
    )


# ---------------------------------------------------------------------------
# kNN-graph hubness audit (round 8)
# ---------------------------------------------------------------------------
_HUB_K = 3
_HUB_MAX_Q = 500  # query-side cap: full corpus at small tiers, sample above


@register(
    "vec_hubness",
    oracle=f"""
    WITH knn AS (
      SELECT * FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY ROUND({_d_cos('q.embedding', 'c.embedding')}, 6) DESC,
                          c.vec_id) AS rk
        FROM embeddings q CROSS JOIN embeddings c
        WHERE q.vec_id < {_HUB_MAX_Q} AND c.vec_id != q.vec_id) t
      WHERE rk <= {_HUB_K}
    ),
    indeg AS (
      SELECT e.vec_id,
             (SELECT COUNT(*) FROM knn WHERE knn.neighbor_id = e.vec_id)
               AS d
      FROM embeddings e WHERE e.vec_id < {_HUB_MAX_Q}
    )
    SELECT CAST(d AS INT) AS in_degree,
           CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM indeg GROUP BY d
    """,
)
def vec_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness audit of the k={_HUB_K} nearest-neighbor graph — the
    high-dimensional pathology metric (Radovanovic et al. 2010): in a
    well-behaved space the in-degree distribution concentrates near k; a
    heavy right tail means a few "hub" vectors appear in everyone's
    neighbor lists, silently dominating retrieval results and poisoning
    kNN classifiers. The standard fixes (centering the embeddings,
    cosine -> inner-product re-normalization, mutual-kNN filtering) are
    all gated on THIS measurement. Vectors never chosen by anyone
    (in-degree 0, the "anti-hubs") are reported by the same histogram.

    Plan: broadcast query side x streaming corpus probe with a per-query
    WindowGroupLimit (the `sim_topk_bruteforce` shape), then in-degree via
    a right-side count against the vector list (zero-degree vectors kept
    by a left anti pattern). Ranking compares ROUNDED cosine with
    neighbor_id tiebreak (the sim_ann_ivf engine-stability convention).
    The query side caps at {_HUB_MAX_Q} (full corpus at the small tiers, a
    fixed sample above — hubness is a distributional property, stable
    under sampling)."""
    e = load(spark, sf_dir, "embeddings")
    # Hoist the self-norms out of the pair expression (r14, the
    # ml_knn_classify fix): sqrt(dot(x, x)) is computed once per ROW on
    # each side instead of once per PAIR, so the 500 x N cross product
    # evaluates ONE 64-dim fold (the dot) per pair instead of three.
    # Bit-identical cosine: same doubles from the same per-array fold,
    # same multiply and division order — only hoisted.
    q = e.filter(F.col("vec_id") < _HUB_MAX_Q).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        _norm(F.col("embedding")).alias("qn"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        _norm(F.col("embedding")).alias("cn"),
    )
    sim6 = F.round(
        _dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn")), 6
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim6"), "neighbor_id")
    knn = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim6.alias("sim6"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _HUB_K)
    )
    deg = knn.groupBy("neighbor_id").agg(F.count(F.lit(1)).alias("d"))
    base = e.filter(F.col("vec_id") < _HUB_MAX_Q).select("vec_id")
    indeg = base.join(
        deg, deg.neighbor_id == base.vec_id, "left"
    ).select(F.coalesce(F.col("d"), F.lit(0)).alias("d"))
    return indeg.groupBy(F.col("d").cast("int").alias("in_degree")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors")
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection + distortion audit (round 8, cont.)
# ---------------------------------------------------------------------------
_JL_OUT = 16  # target dimensionality


def _jl_signs() -> list[list[float]]:
    """The deterministic ±1 projection matrix (Achlioptas 2003: Rademacher
    entries satisfy the JL lemma with the same guarantees as Gaussians),
    seeded by md5 of the (row, column) index — ONE Python generator feeds
    both engines' texts (the `spatial_htm` convention), so the matrix never
    drifts between the Spark plan and the oracle."""
    import hashlib

    return [
        [
            1.0
            if hashlib.md5(f"{i}_{j}".encode()).hexdigest()[0] < "8"
            else -1.0
            for i in range(_DIM)
        ]
        for j in range(_JL_OUT)
    ]


def _jl_masks() -> list[int]:
    """The same matrix packed column-wise into one {_DIM}-long int list:
    bit j of masks[i] is set when sign(i, j) is -1, so the per-element
    sign is ``1 - 2 * ((mask >> j) & 1)``. Packing shrinks the plan from
    ~{_DIM}x{_JL_OUT} float literals (measured: ~4s of Catalyst analysis
    per cold plan) to {_DIM} int literals plus two reused lambdas, with
    BIT-IDENTICAL results (same fold order, same doubles — verified
    element-wise against the unpacked form before the swap)."""
    signs = _jl_signs()
    return [
        sum((1 << j) for j in range(_JL_OUT) if signs[j][i] < 0)
        for i in range(_DIM)
    ]


_JL_MASK_CSV = ",".join(str(m) for m in _jl_masks())


@register(
    "vec_random_projection",
    oracle=f"""
    WITH proj AS (
      SELECT vec_id,
             sqrt({_d_dot('embedding', 'embedding')}) AS norm_in,
             sqrt(list_sum(list_transform(ys, y -> y * y)))
               / sqrt({_JL_OUT}.0) AS norm_out
      FROM (
        SELECT vec_id, embedding,
               list_transform(generate_series(0, {_JL_OUT - 1}), j ->
                 list_sum(list_transform(generate_series(1, {_DIM}), i ->
                   CAST(embedding[i] AS DOUBLE)
                   * (1 - 2 * ((([{_JL_MASK_CSV}])[i] >> j) & 1))))) AS ys
        FROM embeddings
      )
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           {_JL_OUT} AS out_dim,
           ROUND(AVG(norm_out / norm_in), 6) AS avg_ratio,
           ROUND(MIN(norm_out / norm_in), 6) AS min_ratio,
           ROUND(MAX(norm_out / norm_in), 6) AS max_ratio,
           ROUND(stddev_samp(norm_out / norm_in), 6) AS stddev_ratio
    FROM proj WHERE norm_in > 0
    """,
)
def vec_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection {_DIM} -> {_JL_OUT} dims
    with a deterministic Rademacher (±1) matrix (Achlioptas 2003), plus
    the distortion audit JL promises: the ratio of projected to original
    L2 norm (scaled by 1/sqrt(k)) concentrates around 1. Returns the
    corpus-wide ratio stats — the preflight check before swapping full
    embeddings for cheap sketches in ANN candidate generation (the
    projection that `sim_ann_binary`'s sign-bit sketch is the 1-bit
    extreme of, and `vec_truncate_mrl` the learned-basis alternative to).

    Plan: the whole projection is ONE narrow Catalyst projection per
    vector (a transform-over-aggregate fold against the bit-packed sign
    matrix `_jl_masks` — no explode, no shuffle, no Python), followed by
    a single global aggregate. At 100 TB the map stage scales
    embarrassingly; the packed sign matrix is {_DIM} int literals in
    the plan (the exact equivalent of broadcasting the projection
    matrix), and the packing cut cold-plan Catalyst analysis from ~4s
    to well under 1s while producing BIT-IDENTICAL doubles (same
    i = 1..{_DIM} fold order; sqrt IEEE-exact; ratios ROUND 1e-6)."""
    e = load(spark, sf_dir, "embeddings")
    ys = F.expr(
        f"""
        transform(sequence(0, {_JL_OUT - 1}), j ->
          aggregate(zip_with(CAST(embedding AS array<double>),
                             array({_JL_MASK_CSV}),
                             (v, m) -> struct(v AS v, m AS m)),
                    CAST(0.0 AS double),
                    (acc, s) -> acc + s.v
                                * (1 - 2 * (shiftright(s.m, j) & 1))))
        """
    )
    sum_sq = F.aggregate(
        ys, F.lit(0.0), lambda acc, y: acc + y * y
    )
    proj = e.select(
        _norm(F.col("embedding")).alias("norm_in"),
        (F.sqrt(sum_sq) / float(_JL_OUT) ** 0.5).alias("norm_out"),
    ).filter(F.col("norm_in") > 0)
    ratio = F.col("norm_out") / F.col("norm_in")
    return proj.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.lit(_JL_OUT).cast("int").alias("out_dim"),
        F.round(F.avg(ratio), 6).alias("avg_ratio"),
        F.round(F.min(ratio), 6).alias("min_ratio"),
        F.round(F.max(ratio), 6).alias("max_ratio"),
        F.round(F.stddev_samp(ratio), 6).alias("stddev_ratio"),
    )


# ---------------------------------------------------------------------------
# Clustering external-validity metrics: purity / NMI / ARI (round 8, cont.)
# ---------------------------------------------------------------------------
_CPUR_K = 10  # seed count = the fixture's label cardinality


@register(
    "vec_cluster_purity",
    oracle=f"""
    WITH seeds AS (
      SELECT vec_id AS seed_id, embedding AS semb FROM embeddings
      WHERE vec_id BETWEEN 1 AND {_CPUR_K}
    ),
    assign AS (
      SELECT vec_id, label, seed_id FROM (
        SELECT e.vec_id, e.label, s.seed_id,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_sum(list_transform(generate_series(1, {_DIM}),
                   i -> (CAST(e.embedding[i] AS DOUBLE)
                         - CAST(s.semb[i] AS DOUBLE))
                        * (CAST(e.embedding[i] AS DOUBLE)
                           - CAST(s.semb[i] AS DOUBLE)))) ASC,
                          s.seed_id ASC) AS rn
        FROM embeddings e CROSS JOIN seeds s
      ) t WHERE rn = 1
    ),
    cells AS (
      SELECT seed_id AS c, label AS l, CAST(COUNT(*) AS DOUBLE) AS n
      FROM assign GROUP BY 1, 2
    ),
    ct AS (SELECT c, SUM(n) AS nc FROM cells GROUP BY c),
    lt AS (SELECT l, SUM(n) AS nl FROM cells GROUP BY l),
    tot AS (SELECT SUM(n) AS nn FROM cells),
    pur AS (
      SELECT SUM(mx) AS s FROM (SELECT c, MAX(n) AS mx FROM cells GROUP BY c)
    ),
    mi AS (
      SELECT SUM(cells.n / tot.nn
                 * ln(cells.n * tot.nn / (ct.nc * lt.nl))) AS i
      FROM cells JOIN ct USING (c) JOIN lt USING (l) CROSS JOIN tot
    ),
    hc AS (SELECT -SUM(nc / tot.nn * ln(nc / tot.nn)) AS h
           FROM ct CROSS JOIN tot),
    hl AS (SELECT -SUM(nl / tot.nn * ln(nl / tot.nn)) AS h
           FROM lt CROSS JOIN tot),
    pairs AS (
      SELECT (SELECT SUM(n * (n - 1) / 2) FROM cells) AS sij,
             (SELECT SUM(nc * (nc - 1) / 2) FROM ct) AS si,
             (SELECT SUM(nl * (nl - 1) / 2) FROM lt) AS sj,
             (SELECT nn * (nn - 1) / 2 FROM tot) AS stot
    )
    SELECT CAST(tot.nn AS BIGINT) AS n_vectors,
           {_CPUR_K} AS k_clusters,
           FLOOR(pur.s / tot.nn * 10000) / 10000 AS purity,
           FLOOR(2 * mi.i / (hc.h + hl.h) * 10000) / 10000 AS nmi,
           FLOOR((pairs.sij - pairs.si * pairs.sj / pairs.stot)
                 / ((pairs.si + pairs.sj) / 2
                    - pairs.si * pairs.sj / pairs.stot) * 10000) / 10000
             AS ari
    FROM tot CROSS JOIN pur CROSS JOIN mi CROSS JOIN hc CROSS JOIN hl
    CROSS JOIN pairs
    """,
)
def vec_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External clustering validity — purity, normalized mutual
    information, and the adjusted Rand index (Hubert & Arabie 1985) of a
    deterministic seed-nearest assignment (each vector joins the closest
    of the first {_CPUR_K} vectors; Lloyd round zero, `vec_kmeans`'s
    iterated sibling) against the fixture's ground-truth `label` column.
    The three metrics every embedding-clustering eval reports: purity is
    intuitive but inflates with k, NMI corrects by entropy, ARI by the
    chance pairing rate — computed together over ONE contingency table
    so their disagreement is itself informative. The fixture DEMONSTRATES
    that disagreement: its embeddings carry no label structure, so purity
    reads 0.168 (comfortably above the 1/k = 0.1 a naive reader expects
    of chance) while ARI reads 0.0005 — the chance correction working,
    measured rather than narrated.

    Plan: the assignment is a broadcast cross join against {_CPUR_K}
    seed rows with a per-vector WindowGroupLimit top-1 (exact-ANN
    shape); all three metrics reduce the O(k x labels) contingency
    cells — counts are exact integers, pair counts exact integer-valued
    doubles, only ln() touches libm (FLOOR 1e-4). No iteration, no
    driver-side state; ties in the distance order break on seed_id in
    both engines."""
    e = load(spark, sf_dir, "embeddings")
    seeds = e.filter(F.col("vec_id").between(1, _CPUR_K)).select(
        F.col("vec_id").alias("seed_id"), F.col("embedding").alias("semb")
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("semb"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("dist").asc(), F.col("seed_id").asc())
    assign = (
        e.crossJoin(F.broadcast(seeds))
        .select("vec_id", "label", "seed_id", d2.alias("dist"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    cells = assign.groupBy(
        F.col("seed_id").alias("c"), F.col("label").alias("l")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    ct = cells.groupBy("c").agg(F.sum("n").alias("nc"))
    lt = cells.groupBy("l").agg(F.sum("n").alias("nl"))
    tot = cells.agg(F.sum("n").alias("nn"))
    pur = (
        cells.groupBy("c")
        .agg(F.max("n").alias("mx"))
        .agg(F.sum("mx").alias("s"))
    )
    mi = (
        cells.join(ct, "c")
        .join(lt, "l")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.col("n")
                / F.col("nn")
                * F.log(F.col("n") * F.col("nn") / (F.col("nc") * F.col("nl")))
            ).alias("i")
        )
    )
    hc = ct.crossJoin(F.broadcast(tot)).agg(
        (-F.sum(F.col("nc") / F.col("nn") * F.log(F.col("nc") / F.col("nn")))).alias(
            "h_c"
        )
    )
    hl = lt.crossJoin(F.broadcast(tot)).agg(
        (-F.sum(F.col("nl") / F.col("nn") * F.log(F.col("nl") / F.col("nn")))).alias(
            "h_l"
        )
    )
    comb2 = lambda c: F.sum(c * (c - 1) / 2)  # noqa: E731
    sij = cells.agg(comb2(F.col("n")).alias("sij"))
    si = ct.agg(comb2(F.col("nc")).alias("si"))
    sj = lt.agg(comb2(F.col("nl")).alias("sj"))
    f4 = lambda c: F.floor(c * 10000) / 10000  # noqa: E731
    out = (
        tot.crossJoin(pur)
        .crossJoin(mi)
        .crossJoin(hc)
        .crossJoin(hl)
        .crossJoin(sij)
        .crossJoin(si)
        .crossJoin(sj)
    )
    stot = F.col("nn") * (F.col("nn") - 1) / 2
    exp_ = F.col("si") * F.col("sj") / stot
    return out.select(
        F.col("nn").cast("long").alias("n_vectors"),
        F.lit(_CPUR_K).cast("int").alias("k_clusters"),
        f4(F.col("s") / F.col("nn")).alias("purity"),
        f4(2 * F.col("i") / (F.col("h_c") + F.col("h_l"))).alias("nmi"),
        f4(
            (F.col("sij") - exp_) / ((F.col("si") + F.col("sj")) / 2 - exp_)
        ).alias("ari"),
    )


# ---------------------------------------------------------------------------
# IVF recall-vs-nprobe sweep (round 8, continuation)
# ---------------------------------------------------------------------------
_NPROBE_GRID = (1, 2, 4)
_NPROBE_TOPK = 10
_NPROBE_QLO, _NPROBE_QHI = 11, 15  # query vec_ids (disjoint from the seeds)


@register(
    "sim_ann_nprobe_sweep",
    oracle=f"""
    WITH seeds AS (
      SELECT vec_id AS seed_id, embedding AS semb FROM embeddings
      WHERE vec_id BETWEEN 1 AND {_CPUR_K}
    ),
    celldist AS (
      SELECT e.vec_id, e.label, e.embedding, s.seed_id,
             list_sum(list_transform(generate_series(1, {_DIM}),
               i -> (CAST(e.embedding[i] AS DOUBLE)
                     - CAST(s.semb[i] AS DOUBLE))
                    * (CAST(e.embedding[i] AS DOUBLE)
                       - CAST(s.semb[i] AS DOUBLE)))) AS d2
      FROM embeddings e CROSS JOIN seeds s
    ),
    ranked AS (
      SELECT vec_id, embedding, seed_id,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY d2 ASC, seed_id ASC) AS rn
      FROM celldist
    ),
    assign AS (SELECT vec_id, embedding, seed_id AS cell FROM ranked
               WHERE rn = 1),
    queries AS (
      SELECT vec_id AS qid, embedding AS qemb FROM embeddings
      WHERE vec_id BETWEEN {_NPROBE_QLO} AND {_NPROBE_QHI}
    ),
    qcells AS (
      SELECT r.vec_id AS qid, r.seed_id AS cell, r.rn AS cell_rank
      FROM ranked r JOIN queries q ON q.qid = r.vec_id
    ),
    sims AS (
      SELECT q.qid, a.vec_id AS nid, a.cell,
             {_d_dot('q.qemb', 'a.embedding')}
               / (sqrt({_d_dot('q.qemb', 'q.qemb')})
                  * sqrt({_d_dot('a.embedding', 'a.embedding')})) AS cos
      FROM queries q CROSS JOIN assign a
      WHERE a.vec_id <> q.qid
    ),
    truth AS (
      SELECT qid, nid FROM (
        SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid
                 ORDER BY cos DESC, nid ASC) AS rk
        FROM sims) t WHERE rk <= {_NPROBE_TOPK}
    ),
    sweep AS (
      {' UNION ALL '.join(f'''
      SELECT {np} AS nprobe, s.qid, s.nid,
             ROW_NUMBER() OVER (PARTITION BY s.qid
               ORDER BY s.cos DESC, s.nid ASC) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY s.qid) AS DOUBLE) AS n_cand
      FROM sims s JOIN qcells c
        ON c.qid = s.qid AND c.cell = s.cell AND c.cell_rank <= {np}
      ''' for np in _NPROBE_GRID)}
    )
    SELECT nprobe,
           CAST(COUNT(DISTINCT w.qid) AS BIGINT) AS n_queries,
           FLOOR(AVG(n_cand) / (SELECT COUNT(*) - 1 FROM embeddings)
                 * 10000) / 10000 AS cand_frac,
           FLOOR(SUM(CASE WHEN t.nid IS NOT NULL THEN 1.0 ELSE 0 END)
                 / (COUNT(DISTINCT w.qid) * {_NPROBE_TOPK}) * 10000) / 10000
             AS recall_at_{_NPROBE_TOPK}
    FROM (SELECT * FROM sweep WHERE rk <= {_NPROBE_TOPK}) w
    LEFT JOIN truth t ON t.qid = w.qid AND t.nid = w.nid
    GROUP BY nprobe
    """,
)
def sim_ann_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF tuning curve: recall@{_NPROBE_TOPK} and scanned-corpus
    fraction as nprobe sweeps {_NPROBE_GRID} — THE readout an ANN
    deployment tunes against (FAISS's nprobe knob: probe more cells,
    scan more corpus, recover more of the exact top-k). Uses the
    seed-nearest coarse quantizer (`vec_cluster_purity`'s assignment =
    Lloyd round zero; `sim_ann_ivf` owns the iterated variant) over
    {_CPUR_K} cells, five held-out queries, exact-cosine rerank inside
    the probed cells, and brute-force truth computed IN THE SAME QUERY
    so the recall denominator can never drift from what is evaluated
    (the `sim_ann_recall_eval` composition principle). Recall rises
    monotonically with nprobe by construction — pinned in tests.

    Plan: assignment and truth are each one broadcast-seed cross join
    with a per-vector WindowGroupLimit; each sweep leg reuses the SAME
    sims frame filtered by the query's top-nprobe cells (no
    recomputation; at 100 TB sims is never materialized — candidates
    are generated per cell-partition by the bucketed corpus layout the
    assignment column defines). Cosines on identical doubles, ties on
    the unique neighbor id, ratios FLOOR 1e-4."""
    e = load(spark, sf_dir, "embeddings")
    seeds = e.filter(F.col("vec_id").between(1, _CPUR_K)).select(
        F.col("vec_id").alias("seed_id"), F.col("embedding").alias("semb")
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("semb"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wcell = Window.partitionBy("vec_id").orderBy(
        F.col("d2").asc(), F.col("seed_id").asc()
    )
    ranked = (
        e.crossJoin(F.broadcast(seeds))
        .select("vec_id", "embedding", "seed_id", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(wcell))
    ).persist()
    assign = ranked.filter(F.col("rn") == 1).select(
        "vec_id", "embedding", F.col("seed_id").alias("cell")
    )
    queries = e.filter(F.col("vec_id").between(_NPROBE_QLO, _NPROBE_QHI)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qemb")
    )
    qcells = ranked.join(
        queries.select("qid"), ranked.vec_id == F.col("qid")
    ).select("qid", F.col("seed_id").alias("cell"), F.col("rn").alias("cell_rank"))
    cos = _dot(F.col("qemb"), F.col("embedding")) / (
        _norm(F.col("qemb")) * _norm(F.col("embedding"))
    )
    sims = (
        queries.crossJoin(assign)
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("nid"), "cell", cos.alias("cos"))
    ).persist()
    wrk = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid").asc())
    truth = (
        sims.withColumn("rk", F.row_number().over(wrk))
        .filter(F.col("rk") <= _NPROBE_TOPK)
        .select("qid", F.col("nid").alias("tnid"))
    )
    n_corpus = e.count() - 1  # bounded scalar: the recall denominator base
    legs = []
    for np_ in _NPROBE_GRID:
        cand = sims.join(
            qcells.filter(F.col("cell_rank") <= np_),
            ["qid", "cell"],
        )
        wq = Window.partitionBy("qid")
        leg = (
            cand.withColumn("rk", F.row_number().over(wrk))
            .withColumn("n_cand", F.count(F.lit(1)).over(wq).cast("double"))
            .filter(F.col("rk") <= _NPROBE_TOPK)
            .select(F.lit(np_).alias("nprobe"), "qid", "nid", "n_cand")
        )
        legs.append(leg)
    sweep = legs[0]
    for leg in legs[1:]:
        sweep = sweep.unionByName(leg)
    f4 = lambda c: F.floor(c * 10000) / 10000  # noqa: E731
    return (
        sweep.join(
            truth, (sweep.qid == truth.qid) & (sweep.nid == truth.tnid), "left"
        )
        .groupBy("nprobe")
        .agg(
            F.countDistinct(sweep.qid).cast("long").alias("n_queries"),
            f4(F.avg("n_cand") / n_corpus).alias("cand_frac"),
            f4(
                F.sum(F.when(F.col("tnid").isNotNull(), 1.0).otherwise(0.0))
                / (F.countDistinct(sweep.qid) * _NPROBE_TOPK)
            ).alias(f"recall_at_{_NPROBE_TOPK}"),
        )
    )


# ---------------------------------------------------------------------------
# Energy-distance two-sample test between embedding groups (round 8, cont.)
# ---------------------------------------------------------------------------
_ED_LABEL_A, _ED_LABEL_B = 0, 1
_ED_CAP = 500  # deterministic per-group sample cap (vec_id order)


@register(
    "vec_energy_distance",
    oracle=f"""
    WITH ga AS (
      SELECT vec_id, embedding FROM (
        SELECT vec_id, embedding,
               ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
        FROM embeddings WHERE label = {_ED_LABEL_A}) t WHERE rn <= {_ED_CAP}
    ),
    gb AS (
      SELECT vec_id, embedding FROM (
        SELECT vec_id, embedding,
               ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
        FROM embeddings WHERE label = {_ED_LABEL_B}) t WHERE rn <= {_ED_CAP}
    ),
    xy AS (
      SELECT AVG(sqrt(list_sum(list_transform(generate_series(1, {_DIM}),
               i -> (CAST(a.embedding[i] AS DOUBLE)
                     - CAST(b.embedding[i] AS DOUBLE))
                    * (CAST(a.embedding[i] AS DOUBLE)
                       - CAST(b.embedding[i] AS DOUBLE)))))) AS exy,
             CAST(COUNT(*) AS BIGINT) AS n_xy
      FROM ga a CROSS JOIN gb b
    ),
    xx AS (
      SELECT SUM(sqrt(list_sum(list_transform(generate_series(1, {_DIM}),
               i -> (CAST(a.embedding[i] AS DOUBLE)
                     - CAST(b.embedding[i] AS DOUBLE))
                    * (CAST(a.embedding[i] AS DOUBLE)
                       - CAST(b.embedding[i] AS DOUBLE))))))
               / (COUNT(*)) AS exx
      FROM ga a JOIN ga b ON a.vec_id < b.vec_id
    ),
    yy AS (
      SELECT SUM(sqrt(list_sum(list_transform(generate_series(1, {_DIM}),
               i -> (CAST(a.embedding[i] AS DOUBLE)
                     - CAST(b.embedding[i] AS DOUBLE))
                    * (CAST(a.embedding[i] AS DOUBLE)
                       - CAST(b.embedding[i] AS DOUBLE))))))
               / (COUNT(*)) AS eyy
      FROM gb a JOIN gb b ON a.vec_id < b.vec_id
    )
    SELECT xy.n_xy,
           FLOOR(xy.exy * 10000) / 10000 AS mean_cross_dist,
           FLOOR(xx.exx * 10000) / 10000 AS mean_within_a,
           FLOOR(yy.eyy * 10000) / 10000 AS mean_within_b,
           FLOOR((2 * xy.exy - xx.exx - yy.eyy) * 100000) / 100000
             AS energy_distance
    FROM xy CROSS JOIN xx CROSS JOIN yy
    """,
)
def vec_energy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy distance between two embedding groups (Székely & Rizzo
    2004): E = 2·E|X−Y| − E|X−X'| − E|Y−Y'| over pairwise Euclidean
    distances — the multivariate two-sample statistic (zero iff the
    distributions are equal) that needs no binning, no density
    estimate, and no projection, which is why it is the standard
    embedding-drift test where the scalar KS (`agg_ks_test`) cannot
    see correlated-dimension shifts. Within-group means use unordered
    pairs (vec_id < vec_id — the U-statistic denominator n(n-1)/2).
    The fixture's label groups are draws from the SAME distribution,
    so E sits near 0 at every tier: the calibrated null, with the
    three mean distances reported so a real shift is attributable
    (cross-distance up vs within-spread up).

    Plan: two within-group self-joins and one cross join, each bounded
    by the {_ED_CAP}-vector deterministic per-group cap (first
    {_ED_CAP} by vec_id — at 100 TB the energy test runs on a sample BY
    CONSTRUCTION: the statistic is an expectation, subsampling is
    unbiased, and the cap turns the U-statistic's quadratic cost into
    a constant ~{_ED_CAP}²/2 pairs per term — measured 39s -> bounded
    at the ~sf1 tier). Distances fold i = 1..{_DIM}
    in index order (sqrt IEEE-exact); means FLOOR at 1e-4, the
    statistic at 1e-5 (it sits near 0)."""
    e = load(spark, sf_dir, "embeddings")
    wcap = Window.partitionBy("label").orderBy("vec_id")

    def grp(lbl, idname, ename):
        return (
            e.filter(F.col("label") == lbl)
            .withColumn("rn", F.row_number().over(wcap))
            .filter(F.col("rn") <= _ED_CAP)
            .select(F.col("vec_id").alias(idname), F.col("embedding").alias(ename))
        )

    ga = grp(_ED_LABEL_A, "ida", "ea")
    gb = grp(_ED_LABEL_B, "idb", "eb")

    def dist(x, y):
        return F.sqrt(
            F.aggregate(
                F.zip_with(
                    x,
                    y,
                    lambda p, q: (p.cast("double") - q.cast("double"))
                    * (p.cast("double") - q.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )

    xy = ga.crossJoin(gb).agg(
        F.avg(dist(F.col("ea"), F.col("eb"))).alias("exy"),
        F.count(F.lit(1)).cast("long").alias("n_xy"),
    )
    ga2 = ga.select(F.col("ida").alias("ida2"), F.col("ea").alias("ea2"))
    xx = (
        ga.crossJoin(ga2)
        .filter(F.col("ida") < F.col("ida2"))
        .agg(
            (F.sum(dist(F.col("ea"), F.col("ea2"))) / F.count(F.lit(1))).alias(
                "exx"
            )
        )
    )
    gb2 = gb.select(F.col("idb").alias("idb2"), F.col("eb").alias("eb2"))
    yy = (
        gb.crossJoin(gb2)
        .filter(F.col("idb") < F.col("idb2"))
        .agg(
            (F.sum(dist(F.col("eb"), F.col("eb2"))) / F.count(F.lit(1))).alias(
                "eyy"
            )
        )
    )
    f4 = lambda c: F.floor(c * 10000) / 10000  # noqa: E731
    return (
        xy.crossJoin(xx)
        .crossJoin(yy)
        .select(
            "n_xy",
            f4(F.col("exy")).alias("mean_cross_dist"),
            f4(F.col("exx")).alias("mean_within_a"),
            f4(F.col("eyy")).alias("mean_within_b"),
            (
                F.floor(
                    (2 * F.col("exy") - F.col("exx") - F.col("eyy")) * 100000
                )
                / 100000
            ).alias("energy_distance"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding outlier scores (diagonal Mahalanobis) — round 9
# ---------------------------------------------------------------------------
_OUT_TOPK = 20
# chi-square 99th percentile for 64 dof via Wilson-Hilferty with the
# module-baked z(0.99); identical literal text reaches both engines
_OUT_Z99 = 2.326347874041
_OUT_CHI2_99 = round(64 * (1 - 2 / (9 * 64) + _OUT_Z99 * (2 / (9 * 64)) ** 0.5) ** 3, 6)


@register(
    "vec_outlier_scores",
    oracle=f"""
    WITH dims AS (
      SELECT g.j AS dim,
             AVG(e.embedding[g.j + 1]) AS mu,
             VAR_SAMP(e.embedding[g.j + 1]) AS v
      FROM embeddings e
      CROSS JOIN (SELECT unnest(range(0, 64)) AS j) g
      GROUP BY 1
    ),
    stats AS (
      SELECT list(mu ORDER BY dim) AS mus, list(v ORDER BY dim) AS vs
      FROM dims
    ),
    scored AS (
      SELECT e.vec_id,
             list_reduce(list_prepend(0.0,
               list_transform(generate_series(1, 64),
                 i -> (e.embedding[i] - s.mus[i]) * (e.embedding[i] - s.mus[i])
                      / s.vs[i])), (a, b) -> a + b) AS score
      FROM embeddings e CROSS JOIN stats s
    )
    SELECT vec_id, ROUND(score, 4) AS maha_sq,
           score > {_OUT_CHI2_99} AS is_outlier,
           (SELECT CAST(SUM(CASE WHEN score > {_OUT_CHI2_99} THEN 1 ELSE 0 END)
                        AS BIGINT) FROM scored) AS n_outliers_total
    FROM scored
    ORDER BY ROUND(score, 4) DESC, vec_id
    LIMIT {_OUT_TOPK}
    """,
)
def vec_outlier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-corpus outlier screen: squared Mahalanobis distance
    under a diagonal covariance (sum over dims of (x_j - mu_j)^2 /
    var_j), the standard cheap anomaly score for vector corpora before
    indexing or training (full-covariance needs the O(d^2) inverse —
    `vec_pca_evr`'s territory; diagonal is the production screen).
    Returns the top-{_OUT_TOPK} outliers plus the corpus-wide count
    above the chi-square(64) 99th-percentile threshold ({_OUT_CHI2_99}),
    derived via Wilson-Hilferty from the module's baked z(0.99) — the
    null calibration: if embeddings were exactly Gaussian, ~1% would
    flag.

    Per-dimension moments come from ONE posexplode + groupBy(dim) (64
    keys, mergeable) collected into broadcast arrays; each vector's
    score is an in-row sequential fold over identical array element
    order — cross-engine ulp only enters through mu/var fold order,
    absorbed by ROUND(4) and a rank on the rounded score with vec_id
    tie-break.

    Scale: the moment pass shuffles O(dims) rows regardless of corpus
    size; scoring is a narrow map with the 2x64 stats broadcast. The
    top-k is TakeOrdered, the outlier count a 1-row aggregate."""
    e = load(spark, sf_dir, "embeddings")
    dims = (
        e.select(F.posexplode("embedding").alias("dim", "x"))
        .groupBy("dim")
        .agg(F.avg("x").alias("mu"), F.var_samp("x").alias("v"))
    )
    stats = dims.agg(
        F.array_sort(F.collect_list(F.struct("dim", "mu"))).alias("mu_s"),
        F.array_sort(F.collect_list(F.struct("dim", "v"))).alias("v_s"),
    ).select(
        F.transform("mu_s", lambda s: s["mu"]).alias("mus"),
        F.transform("v_s", lambda s: s["v"]).alias("vs"),
    )
    scored = e.crossJoin(F.broadcast(stats)).select(
        "vec_id",
        F.aggregate(
            F.sequence(F.lit(1), F.lit(64)),
            F.lit(0.0),
            lambda a, i: a
            + (F.element_at("embedding", i) - F.element_at("mus", i))
            * (F.element_at("embedding", i) - F.element_at("mus", i))
            / F.element_at("vs", i),
        ).alias("score"),
    )
    total = scored.agg(
        F.sum((F.col("score") > _OUT_CHI2_99).cast("int"))
        .cast("long")
        .alias("n_outliers_total")
    )
    return (
        scored.crossJoin(F.broadcast(total))
        .select(
            "vec_id",
            F.round("score", 4).alias("maha_sq"),
            (F.col("score") > _OUT_CHI2_99).alias("is_outlier"),
            "n_outliers_total",
        )
        .orderBy(F.col("maha_sq").desc(), "vec_id")
        .limit(_OUT_TOPK)
    )


# ---------------------------------------------------------------------------
# Distance-concentration diagnostic (round 9)
# ---------------------------------------------------------------------------
_DC_STRIDE = 17  # deterministic pair stride (coprime to fixture sizes)


@register(
    "vec_dim_concentration",
    oracle=f"""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
    pairs AS (
      SELECT sqrt(list_sum(list_transform(generate_series(1, {{d}}),
               i -> (CAST(a.embedding[i] AS DOUBLE)
                     - CAST(b.embedding[i] AS DOUBLE))
                    * (CAST(a.embedding[i] AS DOUBLE)
                       - CAST(b.embedding[i] AS DOUBLE))))) AS dist
      FROM embeddings a
      JOIN n ON TRUE
      JOIN embeddings b ON b.vec_id = (a.vec_id + {_DC_STRIDE}) % n.n
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(AVG(dist), 6) AS mean_dist,
           ROUND(stddev_samp(dist), 6) AS sd_dist,
           ROUND(stddev_samp(dist) / AVG(dist), 6) AS concentration_ratio,
           ROUND((MAX(dist) - MIN(dist)) / MIN(dist), 6) AS relative_contrast
    FROM pairs
    """.replace("{d}", "{_DIM}").format(_DIM=_DIM),
)
def vec_dim_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-concentration diagnostic (the curse-of-dimensionality
    screen): over a deterministic stride-{_DC_STRIDE} pairing of the
    corpus, the coefficient of variation of pairwise Euclidean distance
    and the relative contrast (max−min)/min — as dimension grows these
    collapse toward 0 and nearest-neighbor search loses meaning
    (Beyer 1999). Run this BEFORE trusting any ANN index choice; healthy
    embeddings keep contrast well above 0 (`vec_hubness` is the
    complementary pathology screen on the neighbor graph).

    Scale: exactly N pairs via an integer-keyed self-join (never the N²
    pair set a naive sample would shuffle) — linear in corpus size, and
    the stride join is key-aligned under any hash layout. Distances in
    explicit double math, identical element order in both engines."""
    e = load(spark, sf_dir, "embeddings")
    n_tot = e.agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = e.alias("a").crossJoin(F.broadcast(n_tot))
    b = e.select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_emb")
    ).alias("b")
    diff_sq = F.zip_with(
        F.col("a.embedding"),
        F.col("b_emb"),
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    dist = F.sqrt(F.aggregate(diff_sq, F.lit(0.0), lambda acc, x: acc + x))
    pairs = a.join(
        b, F.col("b_id") == (F.col("a.vec_id") + _DC_STRIDE) % F.col("n")
    ).select(dist.alias("dist"))
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.avg("dist"), 6).alias("mean_dist"),
        F.round(F.stddev_samp("dist"), 6).alias("sd_dist"),
        F.round(F.stddev_samp("dist") / F.avg("dist"), 6).alias("concentration_ratio"),
        F.round((F.max("dist") - F.min("dist")) / F.min("dist"), 6).alias(
            "relative_contrast"
        ),
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation recall (round 11)
# ---------------------------------------------------------------------------
_MRL_HEAD = 16  # truncated prefix dimensionality
_MRL_K = 5  # rank depth compared
_MRL_NQ = 8  # query vectors (vec_id < _MRL_NQ)


def _mrl_topk_sql(dim_slice: str) -> str:
    """DuckDB top-k CTE body over cosine on a given embedding slice."""
    dot = (
        "list_sum(list_transform(generate_series(1, {d}),"
        " i -> CAST(q.qe[i] AS DOUBLE) * CAST(c.ce[i] AS DOUBLE)))"
    )
    if dim_slice == "full":
        d, qe, ce = _DIM, "q.embedding", "c.embedding"
    else:
        d, qe, ce = _MRL_HEAD, f"q.embedding[1:{_MRL_HEAD}]", f"c.embedding[1:{_MRL_HEAD}]"
    dot_expr = dot.format(d=d).replace("q.qe", qe).replace("c.ce", ce)
    norm_q = dot.format(d=d).replace("q.qe", qe).replace("c.ce", qe)
    norm_c = dot.format(d=d).replace("q.qe", ce).replace("c.ce", ce)
    return f"""
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {dot_expr} / (sqrt({norm_q}) * sqrt({norm_c})) DESC,
                          c.vec_id) AS rk
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {_MRL_NQ}
      ) WHERE rk <= {_MRL_K}"""


@register(
    "sim_mrl_recall",
    oracle=f"""
    WITH full_k AS ({_mrl_topk_sql("full")}),
    head_k AS ({_mrl_topk_sql("head")})
    SELECT f.query_id,
           CAST(COUNT(h.neighbor_id) AS BIGINT) AS n_matched,
           ROUND(COUNT(h.neighbor_id) / {_MRL_K}.0, 6) AS recall_at_{_MRL_K}
    FROM full_k f
    LEFT JOIN head_k h
      ON f.query_id = h.query_id AND f.neighbor_id = h.neighbor_id
    GROUP BY f.query_id
    """,
)
def sim_mrl_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation recall: for each of {_MRL_NQ} query vectors,
    what fraction of the TRUE cosine top-{_MRL_K} (full {_DIM}-dim)
    survives when the index serves only the first {_MRL_HEAD} dims — the
    decision measurement for MRL-style truncation (Kusupati et al. 2022):
    `vec_truncate_mrl` reports how much embedding ENERGY the prefix
    keeps, this reports what that costs in retrieval RECALL, which is
    the number a serving team actually signs off on before shrinking
    the ANN index 4x. Same evaluation-as-an-operator pattern as
    `sim_ann_recall_eval` (recall of the LSH index vs brute force).

    Plan: two broadcast nested-loop top-k probes (query side is
    {_MRL_NQ} rows broadcast; per-query top-{_MRL_K} is a
    WindowGroupLimit, so only k rows per query survive each partition)
    joined on (query, neighbor). The corpus is scanned twice — at scale
    the head-dim probe would come from the truncated index instead, and
    this operator is exactly the offline audit that validates it."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _MRL_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))

    def topk(qe_col, ce_col):
        sim = _dot(qe_col, ce_col) / (_norm(qe_col) * _norm(ce_col))
        w = Window.partitionBy("query_id").orderBy(F.col("s").desc(), "neighbor_id")
        return (
            F.broadcast(q)
            .crossJoin(c)
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id", sim.alias("s"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _MRL_K)
            .select("query_id", "neighbor_id")
        )

    full_k = topk(F.col("qe"), F.col("ce"))
    head_k = (
        topk(F.slice(F.col("qe"), 1, _MRL_HEAD), F.slice(F.col("ce"), 1, _MRL_HEAD))
        .withColumnRenamed("neighbor_id", "h_neighbor")
        .withColumnRenamed("query_id", "h_query")
    )
    # head_k is <= NQ*K rows but sits behind a window, so Catalyst has no
    # size stats and would sort-merge two ~40-row frames — hint broadcast
    joined = full_k.join(
        F.broadcast(head_k),
        (F.col("query_id") == F.col("h_query"))
        & (F.col("neighbor_id") == F.col("h_neighbor")),
        "left",
    ).select("query_id", "h_neighbor")
    return joined.groupBy("query_id").agg(
        F.count("h_neighbor").cast("long").alias("n_matched"),
        F.round(F.count("h_neighbor") / float(_MRL_K), 6).alias(
            f"recall_at_{_MRL_K}"
        ),
    )
