"""Hot-key cap guards for the dedup self-joins (SURVEY.md §2.N scale notes).

A stop-phrase shingle shared by k documents contributes k(k-1)/2 candidate
pairs to the inverted-index self-join; a degenerate LSH bucket does the same
at the band join. These tests inject exactly that corpus shape and assert the
caps keep candidate volume bounded — the round-1 advisory found the caps were
documented but not implemented.
"""

import pytest
from pyspark.sql import functions as F

from fits2db_spark.operators.llm_text import (
    _LSH_BUCKET_CAP,
    _SH_DF_CAP,
    _jaccard_candidates,
    _lsh_candidates,
    _shingles,
    dedup_ngram_jaccard,
)

STOP = "this document is provided under the standard terms of service please read carefully"


def _write_documents(spark, path, texts):
    rows = [
        (i, t, "en", "synthetic", len(t)) for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


@pytest.fixture(scope="module")
def stop_phrase_dir(spark, tmp_path_factory):
    """220 docs: 200 share ONLY the stop phrase (unique 6-word tails), plus
    one true near-dup pair, plus 18 unrelated fillers."""
    n_hot = max(200, _SH_DF_CAP + 40)
    texts = [f"{STOP} tail{i}a tail{i}b tail{i}c tail{i}d tail{i}e tail{i}f" for i in range(n_hot)]
    # a genuine near-dup pair sharing rare shingles (one-word difference)
    texts.append("rare alpha beta gamma delta epsilon zeta eta theta iota kappa")
    texts.append("rare alpha beta gamma delta epsilon zeta eta theta iota mu")
    texts += [f"filler{i} unique{i}x unique{i}y unique{i}z only{i}" for i in range(18)]
    path = str(tmp_path_factory.mktemp("hotcap"))
    _write_documents(spark, path, texts)
    return path


def test_df_cap_bounds_jaccard_candidates(spark, stop_phrase_dir):
    from fits2db_spark.tables import load

    d = load(spark, stop_phrase_dir, "documents")
    sh = _shingles(d)
    n_docs = d.count()
    uncapped_pairs = n_docs * (n_docs - 1) // 2
    cands = _jaccard_candidates(sh).count()
    # stop-phrase-interior shingles exceed the DF cap and are excluded from
    # candidate generation; boundary shingles contain per-doc unique words.
    # Without the cap this corpus yields ~uncapped_pairs candidates.
    assert cands < uncapped_pairs / 100, (cands, uncapped_pairs)
    # the one genuine near-dup pair must still be found
    assert cands >= 1


def test_capped_jaccard_still_exact_on_real_pairs(spark, stop_phrase_dir):
    out = dedup_ngram_jaccard(spark, stop_phrase_dir).collect()
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in out}
    hot_n = max(200, _SH_DF_CAP + 40)
    assert (hot_n, hot_n + 1) in pairs, pairs
    # verification runs on FULL shingle sets: 11-word docs, 9 shingles each,
    # 8 shared -> J = 8 / (9 + 9 - 8) = 0.8
    assert pairs[(hot_n, hot_n + 1)] == pytest.approx(0.8)


def test_bucket_cap_bounds_lsh_candidates(spark):
    # synthetic band table: one degenerate bucket (cap+40 docs) and two
    # healthy buckets of 3 docs each
    k = _LSH_BUCKET_CAP + 40
    rows = [(i, 0, "degenerate") for i in range(k)]
    rows += [(1000 + i, 1, "ok1") for i in range(3)]
    rows += [(2000 + i, 2, "ok2") for i in range(3)]
    bands = spark.createDataFrame(rows, "doc_id long, band int, bkey string")
    got = _lsh_candidates(bands).collect()
    # degenerate bucket would alone contribute k(k-1)/2 pairs; capped out
    assert len(got) == 6, len(got)
    assert all(r.doc_a >= 1000 for r in got)


def test_caps_do_not_fire_on_fixture(spark):
    """The registered fixture queries must be cap-neutral: no fixture shingle
    or bucket is hot, so capped results == uncapped results (the oracle
    comparison already enforces this on the SQL side)."""
    from tests.conftest import SF_SMOKE

    from fits2db_spark.tables import load

    d = load(spark, SF_SMOKE, "documents")
    sh = _shingles(d)
    max_df = (
        sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).agg(F.max("df")).first()[0]
    )
    assert max_df <= _SH_DF_CAP, max_df
