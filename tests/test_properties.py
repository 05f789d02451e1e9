"""Property-based invariants (SURVEY.md §5.3) over generated inputs:
algebraic laws the engine must preserve regardless of data."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=-100, max_value=100),
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        st.sampled_from(["a", "b", "c", None]),
    ),
    min_size=0,
    max_size=60,
)

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v double, tag string")


@given(rows=ROWS)
@_settings
def test_filter_complement_partitions_rows(spark, rows):
    df = _df(spark, rows)
    p = F.col("v") > 0
    n = df.count()
    # null-safe complement: p | ~p must cover every row
    assert df.filter(p).count() + df.filter(~p | p.isNull()).count() == n


@given(rows=ROWS)
@_settings
def test_union_all_cardinality(spark, rows):
    df = _df(spark, rows)
    assert df.unionByName(df).count() == 2 * df.count()


@given(rows=ROWS)
@_settings
def test_dedup_idempotent(spark, rows):
    df = _df(spark, rows)
    once = df.dropDuplicates().count()
    assert df.dropDuplicates().dropDuplicates().count() == once
    assert once <= max(df.count(), 0)


@given(rows=ROWS)
@_settings
def test_row_number_is_bijective(spark, rows):
    from pyspark.sql import Window

    df = _df(spark, rows)
    w = Window.orderBy("k", "v", "tag")
    rn = df.select(F.row_number().over(w).alias("rn"))
    n = df.count()
    got = sorted(r.rn for r in rn.collect())
    assert got == list(range(1, n + 1))


@given(rows=ROWS)
@_settings
def test_inner_join_bounded_by_key_product(spark, rows):
    df = _df(spark, rows)
    a = df.groupBy("k").count().withColumnRenamed("count", "ca")
    b = df.groupBy("k").count().withColumnRenamed("count", "cb")
    joined = df.alias("x").join(df.alias("y"), "k").count()
    expected = (
        a.join(b, "k").select(F.sum(F.col("ca") * F.col("cb")).alias("s")).collect()[0].s
    )
    assert joined == (expected or 0)


def test_minhash_identical_docs_get_identical_signatures(spark):
    from fits2db_spark.operators.llm_text import _doc_shingle_arrays, _minhash_sig

    rows = [(1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog today")]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    sig = _minhash_sig(_doc_shingle_arrays(d)).collect()
    s1 = [v for k, v in sorted(sig[0].asDict().items()) if k != "doc_id"]
    s2 = [v for k, v in sorted(sig[1].asDict().items()) if k != "doc_id"]
    assert s1 == s2
