"""Scalar function groups (SURVEY.md §2.H) — one query per family.

Everything here is a built-in Catalyst expression (JVM-side, inside
whole-stage codegen): the fast path at any scale. Cross-engine parity
hazards handled per SURVEY.md §5:

* DuckDB has no ``initcap`` / ``pmod`` / ``months_between`` — the oracle
  re-expresses the same semantics (per-word capitalization via
  ``list_transform``; ``((a % b) + b) % b``); ``soundex`` has no DuckDB
  equivalent at all -> rows-only entry.
* ``dayofweek``: Spark counts Sunday=1, DuckDB Sunday=0 -> oracle adds 1.
* Spark ``floor``/``ceil`` return BIGINT; DuckDB returns DOUBLE -> casts.
* Spark ``round`` is HALF_UP (away from zero for positives) == DuckDB round
  for the all-positive fixture values; ``bround`` (HALF_EVEN) maps to
  DuckDB ``round_even``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load


@register(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                         AS up,
           lower(p_type)                         AS lo,
           CAST(length(p_name) AS INTEGER)       AS nlen,
           trim(concat(' ', p_name, ' '))        AS trimmed,
           substring(p_name, 1, 4)               AS sub4,
           concat(p_brand, ':', p_type)          AS joined,
           concat_ws('-', p_brand, p_type)       AS joined_ws,
           array_to_string(string_split(p_name, ' '), '|') AS words,
           lpad(p_brand, 12, '*')                AS padded_l,
           rpad(p_brand, 12, '.')                AS padded_r,
           replace(p_name, 'widget', 'gadget')   AS replaced,
           reverse(p_brand)                      AS revd,
           array_to_string(
             list_transform(string_split(p_name, ' '),
                            x -> concat(upper(x[1]), lower(x[2:]))), ' ') AS capped
    FROM part WHERE p_partkey < 150
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 150)
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_type").alias("lo"),
        F.length("p_name").alias("nlen"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.substring("p_name", 1, 4).alias("sub4"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("joined"),
        F.concat_ws("-", "p_brand", "p_type").alias("joined_ws"),
        # joined to a scalar: the driver canonicalizer cannot hash array cells
        F.concat_ws("|", F.split("p_name", " ")).alias("words"),
        F.lpad("p_brand", 12, "*").alias("padded_l"),
        F.rpad("p_brand", 12, ".").alias("padded_r"),
        F.replace(F.col("p_name"), F.lit("widget"), F.lit("gadget")).alias("replaced"),
        F.reverse("p_brand").alias("revd"),
        F.initcap("p_name").alias("capped"),
    )


@register(
    "fn_regex",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, 'Customer#(\\d+)', 1)       AS idstr,
           CAST(regexp_extract(c_name, '(\\d+)', 1) AS BIGINT) AS idnum,
           regexp_replace(c_name, '0+', '0', 'g')              AS squeezed,
           regexp_matches(c_name, '[13579]$')                  AS odd_tail,
           (c_name LIKE '%7')                                  AS like7
    FROM customer
    """,
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / regexp_replace / rlike / like. NOTE: Spark
    regexp_replace is global by default; DuckDB needs the 'g' flag."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"Customer#(\d+)", 1).alias("idstr"),
        F.regexp_extract("c_name", r"(\d+)", 1).cast("long").alias("idnum"),
        F.regexp_replace("c_name", "0+", "0").alias("squeezed"),
        F.col("c_name").rlike("[13579]$").alias("odd_tail"),
        F.col("c_name").like("%7").alias("like7"),
    )


@register(
    "fn_fuzzy",
    oracle="""
    SELECT p_partkey,
           CAST(levenshtein(p_name, 'cold widget') AS INTEGER)  AS lev_name,
           CAST(levenshtein(p_brand, 'Brand#10') AS INTEGER)    AS lev_brand
    FROM part
    """,
)
def fn_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance support for near-dup pipelines (SURVEY.md §2.H fn_fuzzy)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein(F.col("p_name"), F.lit("cold widget")).alias("lev_name"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#10")).alias("lev_brand"),
    )


@register(
    "fn_soundex",
    # DuckDB ships no soundex, but Spark's variant is a small deterministic
    # automaton, reproduced here exactly (verified against F.soundex on edge
    # cases this round): letters map via translate() to codes with H/W='7'
    # (skipped, does NOT reset), vowels AND any non-letter ='0' (resets the
    # last code), adjacent equal codes collapse, result is first letter +
    # 3 codes zero-padded; a non-letter FIRST character returns the input
    # unchanged. The fold is a list_reduce over "result||lastCode" states.
    oracle="""
    WITH ch AS (
      SELECT p_partkey, p_name,
             list_transform(generate_series(1, length(p_name)),
                            i -> substr(upper(p_name), i, 1)) AS cs
      FROM part
    ),
    cod AS (
      SELECT *, list_transform(cs, c -> CASE
               WHEN c BETWEEN 'A' AND 'Z'
               THEN translate(c, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                 '01230127022455012623017202')
               ELSE '0' END) AS ks
      FROM ch
    ),
    st AS (
      SELECT *, list_reduce(
        list_prepend(cs[1] || ks[1], ks[2:]),
        (acc, k) -> CASE
          WHEN k = '7' THEN acc
          WHEN k = '0' THEN substr(acc, 1, length(acc) - 1) || '0'
          WHEN k = substr(acc, length(acc), 1) THEN acc
          WHEN length(acc) <= 4
            THEN substr(acc, 1, length(acc) - 1) || k || k
          ELSE substr(acc, 1, length(acc) - 1) || k
        END) AS state
      FROM cod
    )
    SELECT p_partkey,
           CASE WHEN cs[1] BETWEEN 'A' AND 'Z'
                THEN rpad(substr(state, 1, length(state) - 1), 4, '0')
                ELSE p_name END AS sx_name
    FROM st
    """,
)
def fn_soundex(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select("p_partkey", F.soundex("p_name").alias("sx_name"))


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)        AS yr,
           CAST(month(o_orderdate) AS INTEGER)       AS mo,
           CAST(day(o_orderdate) AS INTEGER)         AS dy,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate AS DATE) + 30            AS plus30,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00')
                AS INTEGER)                          AS days_to_2002,
           last_day(CAST(o_orderdate AS DATE))       AS month_end,
           CAST(epoch_us(o_orderdate) // 1000000 AS BIGINT) AS unix_sec,
           CAST(o_orderdate AS DATE)                 AS as_date,
           make_date(2024, 1, 15)                    AS fixed_date
    FROM orders WHERE o_orderkey < 400
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions. Hazards: Spark dayofweek is Sunday=1 (DuckDB 0);
    Spark datediff(end, start) == DuckDB date_diff('day', start, end)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("plus30"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), F.col("o_orderdate")).alias(
            "days_to_2002"
        ),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.unix_timestamp("o_orderdate").alias("unix_sec"),
        F.col("o_orderdate").cast("date").alias("as_date"),
        F.make_date(F.lit(2024), F.lit(1), F.lit(15)).alias("fixed_date"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1)                       AS r1,
           round_even(l_quantity / 2, 0)                   AS br1,
           CAST(floor(l_extendedprice) AS BIGINT)          AS flr,
           CAST(ceil(l_extendedprice) AS BIGINT)           AS cl,
           abs(l_discount - 0.05)                          AS adev,
           round(exp(l_discount), 8)                       AS e_disc,
           round(ln(l_extendedprice), 8)                   AS ln_price,
           round(log10(l_extendedprice), 8)                AS log_price,
           round(pow(l_quantity, 2), 2)                    AS qty_sq,
           round(sqrt(l_quantity), 8)                      AS qty_rt,
           CAST(sign(l_discount - 0.05) AS DOUBLE)         AS sgn,
           CAST(((l_linenumber - 3) % 5 + 5) % 5 AS INTEGER) AS pm,
           greatest(l_quantity, l_discount * 100)          AS g,
           least(l_quantity, l_discount * 100)             AS l
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("r1"),
        # HALF_EVEN demonstrated on exactly-representable halves (x.0 / x.5):
        # binary doubles near .5 differ between engines' decimal handling.
        F.bround(F.col("l_quantity") / 2, 0).alias("br1"),
        F.floor("l_extendedprice").alias("flr"),
        F.ceil("l_extendedprice").alias("cl"),
        F.abs(F.col("l_discount") - 0.05).alias("adev"),
        F.round(F.exp("l_discount"), 8).alias("e_disc"),
        F.round(F.log("l_extendedprice"), 8).alias("ln_price"),
        F.round(F.log10("l_extendedprice"), 8).alias("log_price"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.round(F.sqrt("l_quantity"), 8).alias("qty_rt"),
        F.signum(F.col("l_discount") - 0.05).alias("sgn"),
        F.pmod(F.col("l_linenumber") - 3, F.lit(5)).alias("pm"),
        F.greatest(F.col("l_quantity"), F.col("l_discount") * 100).alias("g"),
        F.least(F.col("l_quantity"), F.col("l_discount") * 100).alias("l"),
    )


@register(
    "fn_cond",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END                          AS bucket,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN')   AS status2,
           COALESCE(CASE WHEN o_custkey % 2 = 0 THEN NULL ELSE o_custkey END, -1)
                                                          AS odd_cust,
           CASE WHEN o_orderpriority = '1-URGENT' THEN o_orderkey ELSE 0 END
                                                          AS urgent_key
    FROM orders
    """,
)
def fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status2"
        ),
        F.nvl(
            F.when(F.col("o_custkey") % 2 == 0, F.lit(None).cast("long")).otherwise(
                F.col("o_custkey")
            ),
            F.lit(-1).cast("long"),
        ).alias("odd_cust"),
        F.ifnull(
            F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_orderkey")),
            F.lit(0).cast("long"),
        ).alias("urgent_key"),
    )


@register(
    "fn_array",
    oracle="""
    SELECT vec_id,
           array_to_string(arr, ',')                     AS arr,
           CAST(len(arr) AS INTEGER)                     AS n,
           list_contains(arr, 3)                         AS has3,
           array_to_string(list_sort(arr, 'DESC'), ',')  AS sorted_desc,
           array_to_string(list_sort(list_distinct(flatten([arr, arr]))), ',') AS dedup,
           COALESCE(array_to_string(arr[2:4], ','), '')  AS mid,
           arr[2]                                        AS second,
           array_to_string(list_transform(arr, x -> x * 10), ',') AS tens,
           COALESCE(array_to_string(list_filter(arr, x -> x % 2 = 0), ','), '') AS evens,
           CAST(list_sum(arr) AS BIGINT)                 AS total,
           array_to_string(list_transform(generate_series(1, len(arr)),
                          i -> arr[i] + arr[len(arr) + 1 - i]), ',') AS palindrome_sum
    FROM (SELECT vec_id, generate_series(1, label + 1) AS arr
          FROM embeddings WHERE vec_id < 200)
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions incl. higher-order transform/filter/aggregate/zip_with
    — all JVM-side lambda expressions, no Python. Every array-valued result
    is rendered to a ','-joined string for the driver canonicalizer (which
    cannot hash array cells); the computation itself stays array-native up to
    the final projection, so Catalyst still fuses the lambdas."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    base = e.select(
        "vec_id",
        F.sequence(F.lit(1).cast("long"), (F.col("label") + 1).cast("long")).alias("arr"),
    )
    arr = F.col("arr")

    def joined(col, name):
        return F.concat_ws(",", F.transform(col, lambda x: x.cast("string"))).alias(name)

    return base.select(
        "vec_id",
        joined(arr, "arr"),
        F.size(arr).alias("n"),
        F.array_contains(arr, 3).alias("has3"),
        joined(F.sort_array(arr, asc=False), "sorted_desc"),
        joined(F.sort_array(F.array_distinct(F.flatten(F.array(arr, arr)))), "dedup"),
        joined(F.slice(arr, 2, 3), "mid"),
        F.try_element_at(arr, F.lit(2)).alias("second"),
        joined(F.transform(arr, lambda x: x * 10), "tens"),
        joined(F.filter(arr, lambda x: x % 2 == 0), "evens"),
        F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + x).alias("total"),
        joined(F.zip_with(arr, F.reverse(arr), lambda a, b: a + b), "palindrome_sum"),
    )


@register(
    "fn_map",
    oracle="""
    SELECT event_id, 'etype' AS key, event_type AS value FROM events WHERE event_id < 300
    UNION ALL
    SELECT event_id, 'uid', CAST(user_id AS VARCHAR) FROM events WHERE event_id < 300
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + explode back to rows (create_map / map_from_arrays /
    explode). The oracle reproduces the exploded rows relationally."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    m = F.map_from_arrays(
        F.array(F.lit("etype"), F.lit("uid")),
        F.array(F.col("event_type"), F.col("user_id").cast("string")),
    )
    return ev.select("event_id", F.explode(m).alias("key", "value"))


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k_str,
           CAST(json_extract(props, '$.k') AS INTEGER)        AS k_int,
           concat('{"k":', CAST(json_extract(props, '$.k') AS INTEGER), '}') AS rebuilt
    FROM events WHERE event_id < 400
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON parsing of events.props: get_json_object, from_json + field
    access, to_json round trip."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 400)
    parsed = F.from_json(F.col("props"), "k INT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        F.to_json(F.struct(parsed.getField("k").alias("k"))).alias("rebuilt"),
    )


@register(
    "fn_hash",
    oracle="""
    SELECT c_custkey,
           md5(c_name)    AS h_md5,
           sha256(c_name) AS h_sha256
    FROM customer
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("h_md5"),
        F.sha2("c_name", 256).alias("h_sha256"),
    )


@register("fn_hash_native")  # rows-only: xxhash64/crc32/hash are Spark-specific
def fn_hash_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.xxhash64("c_name").alias("h_xx64"),
        F.crc32("c_name").alias("h_crc32"),
        F.hash("c_name").alias("h_spark"),
    )


@register(
    "fn_encode",
    oracle="""
    SELECT n_nationkey,
           to_base64(encode(n_name))                 AS b64,
           CAST(from_base64(to_base64(encode(n_name))) AS VARCHAR) AS roundtrip,
           lower(hex(encode(n_name)))                AS hexed,
           CAST(unhex(lower(hex(encode(n_name)))) AS VARCHAR) AS unhexed,
           CAST(ascii(n_name) AS INTEGER)            AS first_code,
           chr(CAST(65 + n_nationkey % 26 AS INTEGER)) AS letter
    FROM nation
    """,
)
def fn_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary/text codecs: base64, hex, ascii/chr round trips."""
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.base64(F.encode(F.col("n_name"), "utf-8")).alias("b64"),
        F.decode(F.unbase64(F.base64(F.encode(F.col("n_name"), "utf-8"))), "utf-8").alias(
            "roundtrip"
        ),
        F.lower(F.hex(F.encode(F.col("n_name"), "utf-8"))).alias("hexed"),
        F.decode(F.unhex(F.lower(F.hex(F.encode(F.col("n_name"), "utf-8")))), "utf-8").alias(
            "unhexed"
        ),
        F.ascii("n_name").alias("first_code"),
        F.chr(F.lit(65) + F.col("n_nationkey") % 26).alias("letter"),
    )


@register(
    "fn_map_access",
    oracle="""
    SELECT event_id,
           array_to_string(map_keys(map(['t', 'u'],
                [event_type, CAST(user_id AS VARCHAR)])), ',')                 AS ks,
           array_to_string(map_values(map(['t', 'u'],
                [event_type, CAST(user_id AS VARCHAR)])), ',')                 AS vs,
           map(['t', 'u'], [event_type, CAST(user_id AS VARCHAR)])['t'][1]     AS t_val,
           CAST(cardinality(map(['t', 'u'],
                [event_type, CAST(user_id AS VARCHAR)])) AS INTEGER)           AS n
    FROM events WHERE event_id < 250
    """,
)
def fn_map_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + key/value access (map_keys / map_values /
    element_at / size). DuckDB map extraction yields a LIST — the oracle
    unwraps [1]. Key/value lists are ','-joined to scalars for the driver
    canonicalizer (cannot hash array cells)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 250)
    m = F.map_from_arrays(
        F.array(F.lit("t"), F.lit("u")),
        F.array(F.col("event_type"), F.col("user_id").cast("string")),
    )
    return ev.select(
        "event_id",
        F.concat_ws(",", F.map_keys(m)).alias("ks"),
        F.concat_ws(",", F.map_values(m)).alias("vs"),
        F.element_at(m, F.lit("t")).alias("t_val"),
        F.size(m).alias("n"),
    )


@register(
    "fn_json_tuple",
    oracle="""
    SELECT event_id, json_extract_string(props, '$.k') AS k
    FROM events WHERE event_id < 250
    """,
)
def fn_json_tuple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_tuple generator: extract multiple JSON fields in one pass."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 250)
    return ev.select("event_id", F.json_tuple(F.col("props"), "k").alias("k"))


@register(
    "fn_try",
    oracle="""
    SELECT event_id,
           CASE WHEN user_id % 3 = 0 THEN NULL
                ELSE ROUND(value / (user_id % 3), 6) END AS safe_div,
           TRY_CAST(event_type AS INTEGER)               AS bad_cast,
           TRY_CAST(CAST(user_id AS VARCHAR) AS BIGINT)  AS good_cast
    FROM events WHERE event_id < 250
    """,
)
def fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe error handling: try_divide / try_cast return NULL instead of
    failing the job — essential at scale where one malformed row must not
    kill a 10-hour pipeline."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 250)
    return ev.select(
        "event_id",
        F.round(
            F.try_divide(F.col("value"), (F.col("user_id") % 3).cast("double")), 6
        ).alias("safe_div"),
        F.col("event_type").try_cast("int").alias("bad_cast"),
        F.col("user_id").cast("string").try_cast("long").alias("good_cast"),
    )


@register(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_val,
           CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_bucket,
           CAST(json_extract(props, '$.missing') AS INTEGER) IS NULL
             AS missing_is_null
    FROM events
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via Spark 4's VARIANT type: ``parse_json``
    into an open-schema binary-encoded value, then typed path extraction
    with ``variant_get`` / ``try_variant_get`` — the engine-native path for
    JSON event payloads whose schema drifts (vs ``fn_json``'s
    get_json_object string reparsing: VARIANT parses once and extracts
    many times from the binary encoding). Missing paths surface as NULL
    rather than errors. Scale: narrow map, columnar VARIANT stays JVM-side
    through whole-stage codegen."""
    ev = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "int")
    return ev.select(
        "event_id",
        k.alias("k_val"),
        (k % 10).alias("k_bucket"),
        F.try_variant_get(v, "$.missing", "int").isNull().alias("missing_is_null"),
    )


@register(
    "fn_url",
    oracle="""
    WITH u AS (
      SELECT doc_id, lang,
             'https://WWW.' || source || '.Example.COM/articles/'
               || CAST(doc_id AS VARCHAR) || '?utm_source=feed&ref=' || lang
               || '#frag' AS url
      FROM documents
    )
    SELECT doc_id, url,
           lower(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]ref=([^&#]+)', 1) AS ref_param,
           'https://'
             || regexp_replace(lower(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)),
                               '^www\\.', '')
             || regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS norm_url
    FROM u
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing + canonicalization: split a URL into host / path /
    query-param with ``parse_url`` (JVM-native), then produce the
    normalized form — lowercase host, ``www.`` stripped, query string and
    fragment dropped — the dedup key a web-corpus pipeline groups on
    before any content hashing (URL canonicalization collapses most
    crawl-level duplicates for free). URLs here are synthesized
    deterministically from the documents fixture; the oracle re-derives
    every piece with regexes. Scale: narrow map, whole-stage codegen."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://WWW."),
        F.col("source"),
        F.lit(".Example.COM/articles/"),
        F.col("doc_id").cast("string"),
        F.lit("?utm_source=feed&ref="),
        F.col("lang"),
        F.lit("#frag"),
    )
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    path = F.parse_url(F.col("url"), F.lit("PATH"))
    ref = F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("ref"))
    norm = F.concat(
        F.lit("https://"),
        F.regexp_replace(F.lower(host), r"^www\.", ""),
        path,
    )
    return d.select("doc_id", url.alias("url")).select(
        "doc_id",
        "url",
        F.lower(host).alias("host"),
        path.alias("path"),
        ref.alias("ref_param"),
        norm.alias("norm_url"),
    )


_UP = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LO = _UP.lower()
_DIG = "0123456789"


@register(
    "fn_mask",
    oracle=f"""
    SELECT c_custkey,
           translate(c_name, '{_UP}{_LO}{_DIG}',
                     '{"X" * 26}{"x" * 26}{"n" * 10}') AS masked_default,
           regexp_replace(translate(c_name, '{_UP}{_LO}{_DIG}',
                                    '{"U" * 26}{"l" * 26}{"D" * 10}'),
                          '[^UlD]', 'o', 'g') AS masked_custom,
           translate(c_mktsegment, '{_UP}{_LO}{_DIG}',
                     '{"X" * 26}{"x" * 26}{"n" * 10}') AS masked_segment
    FROM customer WHERE c_custkey < 200
    """,
)
def fn_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-masking function group (the governance surface: show the SHAPE
    of PII without the content): Spark's native ``mask`` with the default
    X/x/n classes (other characters preserved) and a fully-custom variant
    (U/l/D with others collapsed to 'o'). The oracle reproduces the exact
    per-character mapping with a one-pass ``translate`` alphabet — a
    single regex chain would re-replace its own substitutions, and the
    custom mask characters are deliberately ALPHANUMERIC so the follow-up
    other-chars regex can never collide with an untranslated original
    (the fixture's literal '#' broke a '#'-based mask).

    Narrow JVM map, zero shuffles; complements text_pii_redact (which
    REMOVES detected entities — masking preserves format for testing and
    lower-trust analytics)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    return c.select(
        "c_custkey",
        F.mask("c_name").alias("masked_default"),
        F.mask(
            "c_name", F.lit("U"), F.lit("l"), F.lit("D"), F.lit("o")
        ).alias("masked_custom"),
        F.mask("c_mktsegment").alias("masked_segment"),
    )


# ---------------------------------------------------------------------------
# Geodesic scalar group (round 6)
# ---------------------------------------------------------------------------


@register(
    "fn_geo",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             ((CAST(c_custkey AS DOUBLE) * 137.50776405) % 360.0) - 180.0 AS lon,
             (((CAST(c_custkey AS DOUBLE) * 0.6180339887) % 1.0) * 2 - 1) * 90.0
               AS lat
      FROM customer WHERE c_custkey BETWEEN 1 AND 499
    )
    SELECT c_custkey,
           FLOOR(6371.0 * 2 * asin(sqrt(
             sin(radians(lat - 10.0) / 2) * sin(radians(lat - 10.0) / 2)
             + cos(radians(10.0)) * cos(radians(lat))
               * sin(radians(lon - 20.0) / 2) * sin(radians(lon - 20.0) / 2)
           )) * 1000) / 1000 AS dist_km,
           FLOOR(((degrees(atan2(
             sin(radians(lon - 20.0)) * cos(radians(lat)),
             cos(radians(10.0)) * sin(radians(lat))
             - sin(radians(10.0)) * cos(radians(lat)) * cos(radians(lon - 20.0))
           )) + 360.0) % 360.0) * 1000) / 1000 AS bearing_deg
    FROM pts
    """,
)
def fn_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geodesic scalar group (§2.H family): great-circle distance
    (haversine, mean Earth radius 6371 km) and initial bearing from a
    fixed reference point (lat 10, lon 20) to every pseudo-sky customer
    point — the per-row geo math under fleet/logistics analytics, all
    whole-stage-codegen trigonometry. Outputs floor to milli-units per
    the cross-engine convention. NOTE the grid is probabilistic, not
    airtight: JVM Math and DuckDB libm trig may differ in the last ulp,
    and FLOOR(x*1000) still flips when a value lands within an ulp of a
    milli-grid boundary — the grid makes divergence rare (no fixture
    point sits near a boundary; pytest pins that margin), it does not
    eliminate it (r6 advice, same exposure as events_periodogram).
    c_custkey=0 is excluded: it maps to the exact south pole, where the
    bearing is atan2(±1ulp, negative) — 180° plus-or-minus one ulp, so
    FLOOR could legitimately flip between engines."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey").between(1, 499))
    lon = ((F.col("c_custkey").cast("double") * 137.50776405) % 360.0) - 180.0
    lat = (((F.col("c_custkey").cast("double") * 0.6180339887) % 1.0) * 2 - 1) * 90.0
    pts = c.select("c_custkey", lon.alias("lon"), lat.alias("lat"))
    lat0, lon0 = 10.0, 20.0
    dlat = F.radians(F.col("lat") - lat0) / 2
    dlon = F.radians(F.col("lon") - lon0) / 2
    dist = (
        6371.0
        * 2
        * F.asin(
            F.sqrt(
                F.sin(dlat) * F.sin(dlat)
                + F.cos(F.radians(F.lit(lat0)))
                * F.cos(F.radians("lat"))
                * F.sin(dlon)
                * F.sin(dlon)
            )
        )
    )
    brg = (
        F.degrees(
            F.atan2(
                F.sin(F.radians(F.col("lon") - lon0)) * F.cos(F.radians("lat")),
                F.cos(F.radians(F.lit(lat0))) * F.sin(F.radians("lat"))
                - F.sin(F.radians(F.lit(lat0)))
                * F.cos(F.radians("lat"))
                * F.cos(F.radians(F.col("lon") - lon0)),
            )
        )
        + 360.0
    ) % 360.0
    return pts.select(
        "c_custkey",
        (F.floor(dist * 1000) / 1000).alias("dist_km"),
        (F.floor(brg * 1000) / 1000).alias("bearing_deg"),
    )


@register(
    "fn_astro",
    oracle="""
    SELECT p_partkey,
           FLOOR((25.0 - 2.5 * log10(p_retailprice)) * 1000) / 1000 AS mag,
           FLOOR((-2.5 * log10(p_retailprice
                               / (p_retailprice + 10.0 * p_size))) * 1000)
             / 1000 AS color,
           FLOOR((5.0 * log10(p_partkey + 13.7) - 5.0) * 1000)
             / 1000 AS dist_mod
    FROM part WHERE p_partkey BETWEEN 1 AND 499
    """,
)
def fn_astro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Astronomical scalar group (§2.H family) — the photometry
    conversions a fits2db-class catalog pipeline applies at load time:
    instrumental magnitude mag = ZP − 2.5·log10(flux) (Pogson, ZP=25),
    color index between two pseudo-bands −2.5·log10(f1/f2), and distance
    modulus 5·log10(d_pc) − 5, all whole-stage-codegen math over fixture
    columns standing in for fluxes/distances. Outputs floor to
    milli-magnitudes per the fn_geo convention; the same probabilistic
    caveat applies (JVM vs libm log10 may differ in the last ulp at a
    grid boundary — tests pin that no fixture value sits within 1e-4 of
    one). DuckDB's bare log() is log10, so the oracle spells log10()
    explicitly."""
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey").between(1, 499))
    flux1 = F.col("p_retailprice")
    flux2 = F.col("p_retailprice") + 10.0 * F.col("p_size")
    # +13.7: keeps every synthetic distance off integer powers of 10
    # (partkey 89 + 10 = 100 pc made dist_mod EXACTLY 5.000 — on the
    # grid boundary; log10 of a power of 10 is exact in both engines
    # today, but the margin contract must not depend on that)
    d_pc = F.col("p_partkey") + 13.7
    return p.select(
        "p_partkey",
        (F.floor((25.0 - 2.5 * F.log10(flux1)) * 1000) / 1000).alias("mag"),
        (F.floor((-2.5 * F.log10(flux1 / flux2)) * 1000) / 1000).alias("color"),
        (F.floor((5.0 * F.log10(d_pc) - 5.0) * 1000) / 1000).alias("dist_mod"),
    )
