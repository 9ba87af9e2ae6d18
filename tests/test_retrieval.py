"""BM25 retrieval and rolling z-score anomaly detection: ranking
semantics on constructed corpora, pandas-recompute parity, and plan
shapes (counts-only shuffles, broadcast query side)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from data_quality_check_spark.operators.retrieval import (
    BM25_B, BM25_K1, bm25_topk)


def _corpus(spark):
    rows = [
        (1, "hash join hash join hash join"),        # both terms, high tf
        (2, "hash table scan filter"),               # one term
        (3, "join order optimizer cost"),            # one term
        (4, "window agg stream window agg"),         # other query
        (5, "nothing relevant here at all"),
        (6, "hash join once"),                       # both terms, low tf
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranking_semantics(spark):
    out = bm25_topk(_corpus(spark), [("q1", ["hash", "join"])],
                    k=10).collect()
    by_rank = {r["rk"]: r for r in out}
    # docs matching BOTH terms outrank single-term docs
    assert by_rank[1]["doc_id"] == 1          # highest tf on both terms
    assert by_rank[2]["doc_id"] == 6          # both terms, lower tf
    assert {by_rank[3]["doc_id"], by_rank[4]["doc_id"]} == {2, 3}
    assert by_rank[1]["n_terms_hit"] == 2
    # non-matching docs never appear
    assert all(r["doc_id"] != 5 for r in out)


def test_bm25_score_matches_formula(spark):
    out = {r["doc_id"]: r["score"]
           for r in bm25_topk(_corpus(spark), [("q1", ["hash"])],
                              k=10).collect()}
    texts = {1: 6, 2: 4, 3: 4, 4: 5, 5: 5, 6: 3}   # doc lengths
    n = 6.0
    avgdl = sum(texts.values()) / n
    df = 3.0                                        # docs with "hash"
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))

    def score(tf, dl):
        s = idf * tf * (BM25_K1 + 1) / (
            tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avgdl))
        return round(int(round(s * 1e6)) / 1e6, 6)

    assert out[1] == score(3, 6)
    assert out[2] == score(1, 4)
    assert out[6] == score(1, 3)


def test_bm25_k_bound_and_tiebreak(spark):
    rows = [(i, "same words exactly") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(df, [("q", ["same"])], k=3).collect()
    # identical scores -> doc_id ascending tiebreak, k respected
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rk"])] \
        == [0, 1, 2]


def test_bm25_plan_broadcasts_queries_no_token_shuffle(spark):
    plan = bm25_topk(_corpus(spark), [("q1", ["hash", "join"])]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # partial aggregation before every Exchange (map-side combine)
    assert "partial_count" in plan


# ---------------------------------------------------------------------------
# rolling z-score anomaly
# ---------------------------------------------------------------------------

def test_zscore_flags_constructed_spike(spark):
    import datetime as dt

    from data_quality_check_spark.queries import REGISTRY
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 12 calm hours of 10 events, then one 100-event spike
    for h in range(13):
        n = 100 if h == 12 else 10
        for _ in range(n):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=1),
                         1, "click", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    import os
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        out = REGISTRY["dq_anomaly_zscore"][0](spark, d).collect()
    flagged = [r for r in out if r["is_anomaly"]]
    assert len(flagged) == 1
    assert flagged[0]["n"] == 100
    # flat baseline: Poisson variance floor makes calm z exactly 0
    calm = [r for r in out if r["n"] == 10 and r["z"] is not None]
    assert calm and all(r["z"] == 0.0 for r in calm)
    # spike z = (100-10)/sqrt(max(0, 10)) = 90/sqrt(10)
    assert flagged[0]["z"] == round(90 / math.sqrt(10), 6)


def test_zscore_matches_pandas_recompute(spark):
    from data_quality_check_spark.queries import REGISTRY

    out = REGISTRY["dq_anomaly_zscore"][0](
        spark, "/root/testdata/sf0.001").toPandas()
    e = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    cnt = (e.assign(bucket=e["ts"].dt.floor("h"))
           .groupby(["event_type", "bucket"]).size()
           .rename("n").reset_index()
           .sort_values(["event_type", "bucket"]))
    got = out.set_index(["event_type", "bucket"]).sort_index()
    for etype, grp in cnt.groupby("event_type"):
        ns = grp["n"].to_numpy(dtype=np.int64)
        for i in range(len(ns)):
            lo = max(0, i - 6)
            win = ns[lo:i]
            m = len(win)
            row = got.loc[(etype, grp["bucket"].iloc[i])]
            if m >= 3:
                s, ss = int(win.sum()), int((win * win).sum())
                var = (ss - s * s / m) / (m - 1)
                z = (ns[i] - s / m) / math.sqrt(max(var, s / m))
                assert row["z"] == round(z, 6)
                assert bool(row["is_anomaly"]) == (abs(z) >= 3.0)
            else:
                assert pd.isna(row["z"])
                assert not row["is_anomaly"]
