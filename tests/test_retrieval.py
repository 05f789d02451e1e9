"""Semantic quality checks for the round-6 retrieval operators (the driver
oracle proves value equality; these prove the operators mean something)."""

from pyspark.sql import functions as F

from fits2db_spark.operators.retrieval import (
    _BLOOM_K,
    _BLOOM_M,
    _BM25_QUERIES,
    join_bloom_filter,
    sim_ann_binary,
    text_bm25,
)
from fits2db_spark.tables import load
from tests.conftest import SF_SMOKE


def test_bm25_top_docs_contain_query_terms(spark):
    """Every top-ranked document must actually contain at least one query
    term (BM25 only scores docs from the queried postings)."""
    rows = text_bm25(spark, SF_SMOKE).collect()
    assert rows, "no results"
    terms = {qid: set(ts) for qid, ts in _BM25_QUERIES}
    docs = {
        r["doc_id"]: set(r["text"].split(" "))
        for r in load(spark, SF_SMOKE, "documents").collect()
    }
    for r in rows:
        assert terms[r["query_id"]] & docs[r["cand_id"] if "cand_id" in r else r["doc_id"]]
    # scores weakly decrease with rank within each query
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rk"], r["score"]))
    for pairs in by_q.values():
        pairs.sort()
        scores = [s for _, s in pairs]
        assert scores == sorted(scores, reverse=True)


def test_bloom_filter_no_false_negatives_and_bounded_fp(spark):
    row = join_bloom_filter(spark, SF_SMOKE).collect()[0]
    # no false negatives: every true match passed the filter
    assert row["n_pass_bloom"] >= row["n_true_match"]
    # FP rate of the pass-through set vs theory: (1-exp(-kn/m))^k with
    # n = distinct build keys; allow 5x slack on the tiny fixture
    import math

    n_keys = (
        load(spark, SF_SMOKE, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .count()
    )
    p = (1 - math.exp(-_BLOOM_K * n_keys / _BLOOM_M)) ** _BLOOM_K
    fp = (row["n_pass_bloom"] - row["n_true_match"]) / max(row["n_orders"], 1)
    assert fp <= 5 * p + 0.01, (fp, p)


def test_binary_ann_recall_vs_bruteforce(spark):
    """Hamming shortlist + exact rerank must recover most of the true
    cosine top-5 (63 sign bits carry real signal on 64-dim vectors)."""
    got = {
        (r["query_id"], r["cand_id"])
        for r in sim_ann_binary(spark, SF_SMOKE).collect()
    }
    e = load(spark, SF_SMOKE, "embeddings")
    from fits2db_spark.operators.llm_vectors import _cos
    from pyspark.sql import Window

    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = e.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "cand_id")
    truth = {
        (r["query_id"], r["cand_id"])
        for r in (
            F.broadcast(q)
            .crossJoin(c)
            .filter(F.col("cand_id") != F.col("query_id"))
            .select("query_id", "cand_id", _cos(F.col("qe"), F.col("ce")).alias("cos"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 5)
        ).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.5, recall


def test_mmr_diversifies_vs_plain_topk(spark):
    """MMR picks must (a) come from the relevance shortlist, (b) start with
    the top-relevance item, and (c) be no LESS diverse than taking the
    plain top-4 by relevance (lower mean pairwise cosine)."""
    import itertools

    import numpy as np

    from fits2db_spark.operators.llm_vectors import sim_mmr_rerank
    from fits2db_spark.tables import load

    rows = sim_mmr_rerank(spark, SF_SMOKE).collect()
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype="f8")
        for r in load(spark, SF_SMOKE, "embeddings").collect()
    }

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    for qid in {r["query_id"] for r in rows}:
        sel = sorted(
            [r for r in rows if r["query_id"] == qid], key=lambda r: r["rk"]
        )
        assert len(sel) == 4
        q = emb[qid]
        rel = sorted(
            ((cos(q, v), k) for k, v in emb.items() if k != qid), reverse=True
        )
        top10 = {k for _, k in rel[:10]}
        assert {r["cand_id"] for r in sel} <= top10
        assert sel[0]["cand_id"] == rel[0][1]

        def mean_pair_sim(ids):
            return float(
                np.mean([cos(emb[a], emb[b]) for a, b in itertools.combinations(ids, 2)])
            )

        mmr_div = mean_pair_sim([r["cand_id"] for r in sel])
        plain_div = mean_pair_sim([k for _, k in rel[:4]])
        assert mmr_div <= plain_div + 1e-9, (qid, mmr_div, plain_div)


def test_bpe_merge_table_properties(spark):
    """Greedy BPE invariants: counts are non-increasing across rounds (a
    merge can only create pairs bounded by the merged pair's count), all
    counts positive, and replaying the merges on the corpus's own most
    frequent word strictly shrinks its symbol sequence."""
    from fits2db_spark.operators.llm_text import bpe_train_merges
    from fits2db_spark.tables import load

    rows = sorted(bpe_train_merges(spark, SF_SMOKE).collect(), key=lambda r: r["round"])
    assert len(rows) == 8
    counts = [r["pair_count"] for r in rows]
    assert all(c > 0 for c in counts)
    assert counts == sorted(counts, reverse=True)

    # replaying the merges over the whole vocabulary must strictly shrink
    # the weighted total symbol count (round 1 alone guarantees pair_count
    # merges happen corpus-wide; a single word need not contain any pair)
    from collections import Counter

    toks = Counter()
    for r in load(spark, SF_SMOKE, "documents").collect():
        toks.update(r["text"].split(" "))

    def replay(word):
        syms = list(word)
        for r in rows:
            merged, out, i = r["left_sym"] + r["right_sym"], [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == r["left_sym"]
                    and syms[i + 1] == r["right_sym"]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    before = sum(len(w) * f for w, f in toks.items())
    after = sum(len(replay(w)) * f for w, f in toks.items())
    # every learned merge fires pair_count times on the corpus it was
    # learned from (greedy counts are exact), so total shrink >= round-1
    # count alone; assert the strict corpus-wide compression
    assert after <= before - rows[0]["pair_count"], (before, after)


def test_rrf_contains_cosine_top1_and_valid_scores(spark):
    from fits2db_spark.operators.retrieval import sim_rrf_fusion

    rows = sim_rrf_fusion(spark, SF_SMOKE).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rk"])
        # both-list members carry two reciprocal terms; scores bounded by
        # 2/(60+1) and positive
        assert all(0 < r["rrf_score"] <= 2 / 61 + 1e-9 for r in rs)
        assert all(r["n_lists"] in (1, 2) for r in rs)
        # the fused top result must appear in both rankings (cos top-1 is
        # rank 1 in one list; it can only be displaced by a both-list doc)
        assert rs[0]["n_lists"] == 2


def test_rake_phrases_are_stopword_free(spark):
    from fits2db_spark.operators.llm_text import _RAKE_STOP, text_keyphrase_rake

    rows = text_keyphrase_rake(spark, SF_SMOKE).collect()
    assert len(rows) == 25
    for r in rows:
        toks = r["phrase"].split(" ")
        assert all(t not in _RAKE_STOP for t in toks), r
        assert r["rake_score"] > 0 and r["n_occurrences"] >= 1


def test_prf_expansion_matches_pandas_rm1(spark):
    import numpy as np
    import pandas as pd

    from fits2db_spark.operators.retrieval import (
        _BM25_QUERIES,
        text_prf_expansion,
    )

    got = text_prf_expansion(spark, SF_SMOKE).toPandas()
    top = text_bm25(spark, SF_SMOKE).toPandas()
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet").set_index("doc_id")
    qterms = {qid: set(ts) for qid, ts in _BM25_QUERIES}
    for qid, g in got.groupby("query_id"):
        fb = top[top.query_id == qid]
        s = fb.score.sum()
        weights = {}
        for _, r in fb.iterrows():
            toks = docs.loc[r.doc_id].text.split(" ")
            dl = len(toks)
            tf = pd.Series(toks).value_counts()
            for w, c in tf.items():
                if w in qterms[qid]:
                    continue
                weights[w] = weights.get(w, 0.0) + c / dl * r.score / s
        ref = sorted(weights.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:8]
        assert list(g.sort_values("rk").term) == [w for w, _ in ref]
        for (_, wref), wgot in zip(ref, g.sort_values("rk").rm1_weight):
            assert abs(wgot - wref) < 1e-4
        # weights are a probability-model estimate: positive, bounded by 1
        assert (g.rm1_weight > 0).all() and (g.rm1_weight < 1).all()


def test_readability_matches_python_reference(spark):
    import re

    import pandas as pd

    from fits2db_spark.operators.retrieval import text_bm25  # noqa: F401
    from fits2db_spark.registry import all_queries

    got = (
        all_queries()["text_readability"](spark, SF_SMOKE)
        .toPandas()
        .set_index("lang")
    )
    d = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    agg = {}
    for _, row in d.iterrows():
        words = [w for w in row.text.split(" ") if w]
        syll = sum(max(1, len(re.findall(r"[aeiouy]+", w))) for w in words)
        sent = max(1, (len(words) + 14) // 15)
        a = agg.setdefault(row.lang, [0, 0, 0, 0])
        a[0] += 1
        a[1] += len(words)
        a[2] += syll
        a[3] += sent
    for lang, (nd, w, y, s) in agg.items():
        r = got.loc[lang]
        assert (r.n_docs, r.words, r.syllables, r.sentences) == (nd, w, y, s)
        assert abs(r.flesch_ease - (206.835 - 1.015 * w / s - 84.6 * y / w)) < 2e-4
        assert abs(r.fk_grade - (0.39 * w / s + 11.8 * y / w - 15.59)) < 2e-4
