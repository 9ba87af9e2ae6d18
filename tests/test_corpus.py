"""Corpus-level training-data ops (operators/corpus.py): pandas
reference parity + determinism + edge cases."""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    pdf = pd.DataFrame({
        "doc_id": list(range(8)),
        "source": ["a", "a", "a", "b", "b", "b", "b", "c"],
        "text": [
            "the quick brown fox jumps over the lazy dog today",
            "the quick brown fox jumps over the lazy dog today",  # exact dup
            "spark shuffles data between stages on wide deps",
            "word word word word word word",                      # repetitive
            "one",                                                # 1 token
            "",                                                   # empty
            "alpha beta gamma delta",
            "the quick brown fox leaps over the lazy dog today",  # near dup
        ],
    })
    return spark.createDataFrame(pdf)


def _words(t):
    return [w for w in t.split(" ") if w != ""]


def test_decontaminate_flags_overlap(spark, docs):
    from data_quality_check_spark.operators import corpus

    ev = docs.filter("doc_id = 0")          # eval set: doc 0
    tr = docs.filter("doc_id <> 0")
    out = (corpus.decontaminate(tr, ev, n=4)
           .toPandas().set_index("doc_id").sort_index())
    # exact dup of the eval doc: every 4-gram hits
    assert out.loc[1, "contaminated"] and out.loc[1, "contam_frac"] == 1.0
    # near dup: some but not all grams hit
    assert out.loc[7, "contaminated"] and 0 < out.loc[7, "contam_frac"] < 1
    # unrelated docs: clean
    assert not out.loc[2, "contaminated"] and out.loc[2, "n_hits"] == 0
    # short/empty docs produce zero grams but are NOT dropped
    assert out.loc[4, "n_grams"] == 0 and not out.loc[4, "contaminated"]
    assert out.loc[5, "n_grams"] == 0
    assert len(out) == 7


def test_quota_sample_caps_and_determinism(spark, docs):
    from data_quality_check_spark.operators import corpus

    a = (corpus.quota_sample(docs, "source", "doc_id", k=2)
         .select("doc_id", "source", "sample_rank").toPandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (corpus.quota_sample(docs, "source", "doc_id", k=2)
         .select("doc_id", "source", "sample_rank").toPandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)     # keyed hash => reproducible
    counts = a.groupby("source").size()
    assert counts["a"] == 2 and counts["b"] == 2 and counts["c"] == 1
    assert (a.sample_rank <= 2).all()


def test_hash_sample_is_stable_subset(spark, docs):
    from data_quality_check_spark.operators import corpus

    kept = corpus.hash_sample(docs, "doc_id", "80000000")
    ids1 = sorted(r.doc_id for r in kept.select("doc_id").collect())
    ids2 = sorted(r.doc_id for r in kept.select("doc_id").collect())
    assert ids1 == ids2
    # a lower threshold keeps a subset of a higher threshold's rows
    sub = sorted(r.doc_id for r in corpus.hash_sample(
        docs, "doc_id", "40000000").select("doc_id").collect())
    assert set(sub) <= set(ids1)


def test_repetition_signals_vs_pandas_reference(spark, docs):
    from data_quality_check_spark.operators import corpus

    out = (corpus.repetition_signals(docs)
           .toPandas().set_index("doc_id").sort_index())
    src = docs.toPandas().set_index("doc_id").sort_index()
    for doc_id, row in src.iterrows():
        w = _words(row["text"])
        got = out.loc[doc_id]
        assert got["n_words"] == len(w)
        if not w:
            assert pd.isna(got["dup_word_frac"])
            continue
        assert got["dup_word_frac"] == pytest.approx(
            round(1.0 - len(set(w)) / len(w), 6), abs=1e-9)
        assert got["top_word_frac"] == pytest.approx(
            round(Counter(w).most_common(1)[0][1] / len(w), 6), abs=1e-9)
        bg = [f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)]
        if bg:
            assert got["top_bigram_frac"] == pytest.approx(
                round(Counter(bg).most_common(1)[0][1] / len(bg), 6),
                abs=1e-9)
        else:
            assert pd.isna(got["top_bigram_frac"])


def test_pack_token_bins_greedy_cumulative(spark, docs):
    from data_quality_check_spark.operators import corpus

    out = (corpus.pack_token_bins(docs, "source", "doc_id", "text",
                                  capacity=10)
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    src = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    # reference: cumulative tokens-before within source, doc_id order
    cum: dict = {}
    for _, row in src.iterrows():
        n = len(_words(row["text"]))
        before = cum.get(row["source"], 0)
        cum[row["source"]] = before + n
        got = out[out.doc_id == row["doc_id"]].iloc[0]
        assert got["n_tokens"] == n
        assert got["bin"] == before // 10
    # bins start at 0 and are contiguous per source
    for _, g in out.groupby("source"):
        bins = sorted(g.bin.unique())
        assert bins == list(range(len(bins)))


def test_scrub_regex_sql_replaces_pii(spark):
    from data_quality_check_spark.queries import REGISTRY

    import re

    fn, _ = REGISTRY["scrub_regex_sql"]
    out = fn(spark, "/root/testdata/sf0.001").toPandas()
    joined = " ".join(out.caption_scrubbed_sql.dropna())
    assert "<EMAIL>" in joined          # fixture captions contain PII
    # no email-shaped substring survives (bare @ in symbol-noise
    # captions is expected and is not PII)
    assert not re.search(
        r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b", joined)


def test_corpus_ops_partition_invariant(spark):
    """Results are a pure function of the data, not of its physical
    layout: repartitioning the input must change nothing (the
    resume/recompute guarantee the sampling ops advertise)."""
    from data_quality_check_spark.operators import corpus

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d7 = d.repartition(7)
    builders = [
        lambda x: corpus.decontaminate(
            x.filter("doc_id % 37 <> 0"), x.filter("doc_id % 37 = 0"), n=4),
        lambda x: corpus.quota_sample(x, "source", "doc_id", 25)
                        .select("doc_id", "source", "sample_rank"),
        lambda x: corpus.hash_sample(x, "doc_id", "40000000")
                        .select("doc_id", "sample_key"),
        lambda x: corpus.repetition_signals(x),
        lambda x: corpus.pack_token_bins(x, "source", "doc_id", "text", 256),
    ]
    for build in builders:
        a = build(d).toPandas().sort_values("doc_id").reset_index(drop=True)
        b = build(d7).toPandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


def test_repetition_signals_hypothesis_fuzz(spark):
    """Randomized token streams (incl. repeats, unicode-ish tokens,
    single tokens) against the Counter reference — the HOF
    longest-equal-run trick must equal the true mode count always."""
    import random

    from collections import Counter

    from data_quality_check_spark.operators import corpus

    rng = random.Random(42)
    vocab = ["a", "b", "ab", "zz", "é", "漢", "tok1", "x" * 30]
    rows = []
    for i in range(60):
        n = rng.randrange(0, 40)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = (corpus.repetition_signals(df)
           .toPandas().set_index("doc_id").sort_index())
    for i, text in rows:
        w = [t for t in text.split(" ") if t]
        got = out.loc[i]
        if not w:
            assert pd.isna(got["top_word_frac"])
            continue
        top = Counter(w).most_common(1)[0][1]
        assert got["top_word_frac"] == pytest.approx(
            round(top / len(w), 6), abs=1e-9), (i, text)


def test_repetition_signals_zero_shuffle(spark, docs):
    """The scale claim: no Exchange in the physical plan."""
    from data_quality_check_spark.operators import corpus

    plan = (corpus.repetition_signals(docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_hll_sketch_union_partition_invariant(spark):
    """Sketch-union estimates are a pure function of the data
    (register-max union), independent of how rows were partitioned
    into partial sketches — the property that makes per-bucket
    sketches safely mergeable across checkpoint waves."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, i % 5, i % 12) for i in range(20000)], "id long, g int, m int")

    def est(frame, part_col):
        sk = frame.groupBy("g", part_col).agg(
            F.hll_sketch_agg("id", 14).alias("sk"))
        return {r["g"]: r["e"] for r in
                sk.groupBy("g").agg(F.hll_sketch_estimate(
                    F.hll_union_agg("sk")).alias("e")).collect()}

    by_m = est(df, "m")
    by_id = est(df.withColumn("p", (F.col("id") % 7).cast("int")), "p")
    # estimates are NOT bit-identical across partial-sketch layouts
    # (sparse-mode merges are layout-sensitive); the contract is the
    # accuracy bound, which must hold for EVERY layout, and the
    # layout-induced wander must stay an order of magnitude inside it
    for got in (by_m, by_id):
        for g, e in got.items():
            assert abs(e - 4000) / 4000 <= 0.02
    for g in by_m:
        assert abs(by_m[g] - by_id[g]) / 4000 <= 0.01


def test_hash_split_exhaustive_and_stable(spark, docs):
    """Every row gets exactly one label; fractions approximate
    90/5/5; labels are invariant under repartitioning."""
    from data_quality_check_spark.operators.corpus import hash_split

    out = hash_split(docs, "doc_id").select("doc_id", "split")
    rows = {r.doc_id: r.split for r in out.collect()}
    assert len(rows) == docs.count()
    assert set(rows.values()) <= {"train", "val", "test"}
    n = len(rows)
    frac_train = sum(1 for v in rows.values() if v == "train") / n
    assert 0.8 < frac_train < 0.97
    again = {r.doc_id: r.split
             for r in hash_split(docs.repartition(7), "doc_id")
             .select("doc_id", "split").collect()}
    assert rows == again


def test_mixture_sample_rates_and_independence(spark):
    """Per-group keep fractions track the requested mixture; a row's
    fate depends only on its id, so retuning ONE group's rate leaves
    every other group's picked set bit-identical; rate 1.0 keeps the
    group in full and rate 0.0 drops it entirely."""
    from data_quality_check_spark.operators.corpus import mixture_sample

    n = 4000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("g"), (F.col("id") % 4).cast("string")).alias("lang"))
    rates = {"g0": 0.25, "g1": 1.0, "g2": 0.0}
    out = mixture_sample(df, "lang", "doc_id", rates, default_rate=0.6)
    kept = {r.doc_id: r.lang for r in out.collect()}
    by = Counter(kept.values())
    assert by["g1"] == n // 4                      # rate 1.0: all rows
    assert "g2" not in by                          # rate 0.0: none
    assert abs(by["g0"] / (n // 4) - 0.25) < 0.05
    assert abs(by["g3"] / (n // 4) - 0.60) < 0.05  # default rate

    # retune g0 only: g1/g3 picks must be identical sets
    out2 = mixture_sample(df, "lang", "doc_id", {**rates, "g0": 0.9},
                          default_rate=0.6)
    kept2 = {r.doc_id: r.lang for r in out2.collect()}
    for g in ("g1", "g3"):
        assert ({k for k, v in kept.items() if v == g}
                == {k for k, v in kept2.items() if v == g})
    # g0 at a higher rate is a SUPERSET of g0 at the lower rate
    assert ({k for k, v in kept.items() if v == "g0"}
            <= {k for k, v in kept2.items() if v == "g0"})


def _dup_spans_ref(texts, n, min_docs):
    """Pure-python reference for dup_spans: per doc (n_tokens,
    n_positions, n_dup_positions, dup_covered via sorted-interval
    union)."""
    from collections import defaultdict

    toks = {i: [t for t in txt.split(" ") if t] for i, txt in texts.items()}
    grams = {i: [" ".join(w[p:p + n]) for p in range(len(w) - n + 1)]
             for i, w in toks.items()}
    docs_per_gram = defaultdict(set)
    for i, gs in grams.items():
        for g in gs:
            docs_per_gram[g].add(i)
    out = {}
    for i, w in toks.items():
        if len(w) < n:
            continue
        pos = [p for p, g in enumerate(grams[i])
               if len(docs_per_gram[g]) >= min_docs]
        covered = 0
        for a, b in zip(pos, pos[1:] + [None]):
            covered += n if b is None else min(n, b - a)
        out[i] = (len(w), len(grams[i]), len(pos), covered)
    return out


def test_dup_spans_matches_python_reference(spark, docs):
    from data_quality_check_spark.operators.corpus import dup_spans

    texts = {r.doc_id: r.text for r in docs.collect()}
    exp = _dup_spans_ref(texts, n=3, min_docs=2)
    got = (dup_spans(docs, "text", "doc_id", n=3, min_docs=2)
           .toPandas().set_index("id").sort_index())
    assert set(got.index) == set(exp)
    for i, (nt, np_, nd, cov) in exp.items():
        row = got.loc[i]
        assert (row.n_tokens, row.n_positions,
                row.n_dup_positions, row.dup_covered) == (nt, np_, nd, cov)
        assert row.dup_frac == round(cov / nt, 6)
    # the exact-dup pair is fully covered
    assert got.loc[0, "dup_frac"] == 1.0 and got.loc[1, "dup_frac"] == 1.0


def test_dup_spans_interval_union_merges_overlaps(spark):
    """Two dup spans overlapping by one token must count the shared
    token ONCE; a doc whose dup grams are disjoint sums them."""
    import pandas as pd
    from data_quality_check_spark.operators.corpus import dup_spans

    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [
            # positions 1,2 duplicated (grams 'b c d', 'c d e' in doc1
            # as well): union of [1,3] and [2,4] = 4 tokens, not 6
            "a b c d e z1 z2 z3",
            "q b c d e r s t",
            "unrelated words only here now",
        ],
    })
    out = (dup_spans(spark.createDataFrame(pdf), "text", "doc_id",
                     n=3, min_docs=2)
           .toPandas().set_index("id"))
    assert out.loc[0, "n_dup_positions"] == 2
    assert out.loc[0, "dup_covered"] == 4
    assert out.loc[2, "n_dup_positions"] == 0
    assert out.loc[2, "dup_covered"] == 0


def test_bloom_decontaminate_guarantees(spark, docs):
    """No false negatives at ANY sizing; zero false positives at the
    default sizing on this corpus (expected-FP ~0); a deliberately
    tiny bitset forces FPs but still never loses a true hit."""
    from data_quality_check_spark.operators.corpus import (
        bloom_decontaminate, decontaminate)

    ev = docs.filter("doc_id = 0")
    tr = docs.filter("doc_id <> 0")
    exact = (decontaminate(tr, ev, n=4)
             .toPandas().set_index("doc_id").sort_index())
    bloom = (bloom_decontaminate(tr, ev, n=4)
             .toPandas().set_index("id").sort_index())
    assert list(exact.index) == list(bloom.index)
    assert (exact.n_grams == bloom.n_grams).all()
    # default sizing: bloom == exact on this corpus
    assert (bloom.n_bloom_hits == exact.n_hits).all()
    assert (bloom.bloom_contaminated == exact.contaminated).all()
    # tiny bitset (64 bits): saturated -> false positives appear,
    # but every exact hit is still a bloom hit
    tiny = (bloom_decontaminate(tr, ev, n=4, m_bits=64)
            .toPandas().set_index("id").sort_index())
    assert (tiny.n_bloom_hits >= exact.n_hits).all()
    assert (tiny.bloom_contaminated | ~exact.contaminated).all()


def test_chunk_documents_reconstruction_and_boundaries(spark):
    """Chunks reconstruct the doc exactly (drop the overlap prefix of
    every chunk after the first); boundary sizes: 1 token, exactly one
    chunk, one token over, long doc."""
    import pandas as pd
    from data_quality_check_spark.operators.corpus import chunk_documents

    chunk, ov = 8, 3
    step = chunk - ov
    texts = {
        0: "t0",
        1: " ".join(f"w{i}" for i in range(chunk)),        # exactly 1
        2: " ".join(f"w{i}" for i in range(chunk + 1)),    # 2 chunks
        3: " ".join(f"w{i}" for i in range(47)),           # long
    }
    pdf = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    out = (chunk_documents(spark.createDataFrame(pdf), "text", "doc_id",
                           chunk_tokens=chunk, overlap=ov)
           .toPandas().sort_values(["id", "chunk_id"]))
    for i, txt in texts.items():
        toks = txt.split(" ")
        rows = out[out.id == i]
        # start positions advance by step; last chunk reaches the end
        assert list(rows.start_tok) == [
            1 + c * step for c in range(len(rows))]
        assert rows.iloc[-1].start_tok + rows.iloc[-1].n_tok - 1 == len(toks)
        # every chunk except maybe the last is full-size
        assert (rows.n_tok.iloc[:-1] == chunk).all()
        # reconstruction: first chunk whole, then drop `ov` tokens
        rebuilt = rows.iloc[0].chunk_text.split(" ")
        for t in rows.chunk_text.iloc[1:]:
            rebuilt += t.split(" ")[ov:]
        # overlapping tokens agree
        for r in rows.iloc[1:].itertuples():
            assert (r.chunk_text.split(" ")[:ov]
                    == toks[r.start_tok - 1:r.start_tok - 1 + ov])
        assert rebuilt == toks
    assert len(out[out.id == 1]) == 1
    assert len(out[out.id == 2]) == 2


def test_zipf_slope_matches_numpy(spark):
    """Slope/r2 vs a numpy least-squares reference on a corpus with a
    known frequency staircase; vocab and top-k accounting exact."""
    import numpy as np
    import pandas as pd
    from data_quality_check_spark.operators.corpus import zipf_slope

    # word w_i appears (20 - i) times, i = 0..19 -> freqs 20..1
    words = []
    for i in range(20):
        words += [f"w{i:02d}"] * (20 - i)
    pdf = pd.DataFrame({"doc_id": [0], "text": [" ".join(words)]})
    out = zipf_slope(spark.createDataFrame(pdf), "text", top_k=10).toPandas()
    assert out.vocab[0] == 20 and out.n_top[0] == 10
    y = np.log(np.arange(20, 10, -1, dtype=float))   # top-10 freqs
    x = np.log(np.arange(1, 11, dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    assert abs(out.slope[0] - slope) < 1e-6
    assert abs(out.r2[0] - r * r) < 1e-6


def test_funnel_ordering_semantics(spark):
    """A user whose purchase precedes their click must NOT count as a
    purchase conversion; strictly-after semantics (ties excluded)."""
    import pandas as pd
    from data_quality_check_spark.operators.metrics import funnel

    rows = [
        # u1: clean view -> click -> purchase
        (1, "view", 1.0), (1, "click", 2.0), (1, "purchase", 3.0),
        # u2: purchase BEFORE click: stops at click
        (2, "view", 1.0), (2, "purchase", 1.5), (2, "click", 2.0),
        # u3: click ties view ts exactly: strictly-after excludes it
        (3, "view", 5.0), (3, "click", 5.0),
        # u4: never views: not even step 0
        (4, "click", 1.0), (4, "purchase", 2.0),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "event_type", "s"])
    pdf["ts"] = pd.to_datetime(pdf["s"], unit="s")
    out = (funnel(spark.createDataFrame(pdf[["user_id", "event_type", "ts"]]),
                  ["view", "click", "purchase"])
           .toPandas().set_index("step"))
    assert list(out.n_users) == [3, 2, 1]
    assert out.loc[2, "frac_of_first"] == round(1 / 3, 6)
    assert out.loc[2, "frac_of_prev"] == 0.5


def test_retention_cohorts_matches_hand_computation(spark):
    """Two cohorts, known return pattern; offset-0 fraction is 1.0
    and a user active twice in one bucket counts once."""
    import pandas as pd
    from data_quality_check_spark.operators.metrics import retention_cohorts

    day = 86400.0
    rows = [
        # cohort 0 (bucket of min ts): u1 returns in bucket 1 twice,
        # u2 never returns
        (1, 0.0), (1, 7.5 * day), (1, 8.5 * day),
        (2, 1.0 * day),
        # cohort 1: u3 first seen in bucket 1, returns bucket 2
        (3, 8.0 * day), (3, 15.0 * day),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "s"])
    pdf["ts"] = pd.to_datetime(pdf["s"], unit="s")
    out = (retention_cohorts(spark.createDataFrame(
        pdf[["user_id", "ts"]]), bucket_days=7)
        .toPandas().set_index(["cohort", "offset"]).sort_index())
    assert out.loc[(0, 0), "n_users"] == 2
    assert out.loc[(0, 1), "n_users"] == 1       # u1 once, not twice
    assert out.loc[(0, 1), "retained_frac"] == 0.5
    assert out.loc[(1, 0), "n_users"] == 1
    assert out.loc[(1, 1), "retained_frac"] == 1.0
    assert (out.xs(0, level="offset").retained_frac == 1.0).all()


def test_component_split_no_cross_split_leakage(spark, docs):
    """Every near-dup component lands in exactly one split; the
    split label is a pure function of the component label (same
    md5-prefix rule as hash_split); dup docs share their keeper's
    split."""
    from data_quality_check_spark.operators.corpus import (
        component_split, hash_split)

    # 16 bands of 1 hash: candidate recall ~1 even for a single
    # borderline pair (the default 4x4 banding has a ~27% per-pair
    # miss rate at shingle-jaccard ~0.7 — fine for corpora, flaky
    # for an 8-doc fixture)
    out = component_split(docs, "text", "doc_id",
                          salt="csp:", threshold=0.4,
                          num_hashes=16, bands=16).toPandas()
    assert len(out) == 8
    # docs 0/1 exact dups, 7 near dup of 0 (trigram jaccard 5/11
    # ~ 0.45) -> one component, one split
    comp0 = out.set_index("doc_id").loc[[0, 1, 7]]
    assert comp0["component"].nunique() == 1
    assert comp0["split"].nunique() == 1
    # no component spans splits, globally
    assert (out.groupby("component")["split"].nunique() == 1).all()
    # split equals hash_split applied to the component label
    ref = hash_split(
        spark.createDataFrame(out[["component"]].drop_duplicates()),
        "component", salt="csp:").toPandas().set_index("component")
    got = out.set_index("doc_id")
    for _, row in out.iterrows():
        assert row["split"] == ref.loc[row["component"], "split"]
    # singletons are their own component
    assert got.loc[4, "component"] == 4
    assert not got.loc[4, "is_dup"]


def test_cluster_size_stats_histogram(spark, docs):
    """8 docs: one 3-cluster (0,1,7), five singletons -> histogram
    rows (1,5) and (3,1); pct sums to 1."""
    from data_quality_check_spark.operators.corpus import (
        cluster_size_stats)

    out = (cluster_size_stats(docs, "text", "doc_id", threshold=0.4,
                              num_hashes=16, bands=16)
           .toPandas().set_index("cluster_size").sort_index())
    assert out.loc[1, "n_clusters"] == 5
    assert out.loc[3, "n_clusters"] == 1
    assert out.loc[3, "n_docs"] == 3
    assert abs(out["pct_docs"].sum() - 1.0) < 1e-9


# ---------------------------------------------------------------------------


def test_temperature_sample_flattens_and_saturates(spark):
    from data_quality_check_spark.operators.corpus import temperature_sample

    rows = ([("big", i) for i in range(400)]
            + [("rare", i + 1000) for i in range(16)])
    df = spark.createDataFrame(rows, "g string, id long")
    out = temperature_sample(df, "g", "id", alpha=0.5, budget_frac=0.5)
    rep = {r["g"]: r for r in
           (out.groupBy("g")
            .agg(F.sum(F.col("kept").cast("long")).alias("k"),
                 F.count("*").alias("n"),
                 F.max("rate_ppm").alias("ppm")).collect())}
    # sqrt weights: w_big = 20, w_rare = 4, T = 208
    # rate_rare = 208*4/24/16 = 2.17 -> saturates at 1.0 (keep ALL)
    assert rep["rare"]["k"] == 16 and rep["rare"]["ppm"] == 1000000
    # rate_big = 208*20/24/400 = 0.433..
    assert 0 < rep["big"]["k"] < 400
    assert abs(rep["big"]["ppm"] / 1e6 - 208 * 20 / 24 / 400) < 1e-4
    # sampled count concentrates near rate * n (md5 uniforms)
    assert abs(rep["big"]["k"] - 400 * 0.4333) < 60


def test_temperature_sample_partitioning_invariant(spark):
    """The keep SET is a pure function of (salt, id, group counts) —
    repartitioning must not change a single row's fate."""
    from data_quality_check_spark.operators.corpus import temperature_sample

    rows = [(f"s{i % 7}", i) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, id long")
    a = {r["id"] for r in temperature_sample(df, "g", "id")
         .filter("kept").select("id").collect()}
    b = {r["id"] for r in temperature_sample(df.repartition(13), "g", "id")
         .filter("kept").select("id").collect()}
    assert a == b and len(a) > 0


def test_dsir_select_prefers_target_like_docs(spark):
    """DSIR (Xie et al. 2023): raw docs sharing the target corpus's
    n-gram distribution must outscore raw docs that don't, and the
    selection must be deterministic and partitioning-invariant."""
    from data_quality_check_spark.operators.corpus import dsir_select

    cat = "the small cat sat on the warm mat near the fire"
    dog = "ein grosser hund lief schnell durch den dunklen wald heute"
    rows = ([(i, cat + f" v{i}", True) for i in range(20)]
            + [(100 + i, cat + f" w{i}", False) for i in range(5)]
            + [(200 + i, dog + f" x{i}", False) for i in range(5)])
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    out = dsir_select(df, "tgt", k=10).collect()
    assert len(out) == 10
    w = {r["doc_id"]: r["logw_ppm"] for r in out}
    # every cat-like raw doc outweighs every dog-like raw doc
    assert min(w[i] for i in range(100, 105)) > max(
        w[i] for i in range(200, 205))
    # rank ordering consistent with sel_key desc
    ranks = [r["rank"] for r in sorted(out, key=lambda r: -r["sel_key"])]
    assert ranks == sorted(ranks)
    # partitioning-invariant (exact bigint weights + keyed gumbel)
    again = dsir_select(df.repartition(7), "tgt", k=10).collect()
    assert {(r["doc_id"], r["logw_ppm"], r["rank"]) for r in again} == \
           {(r["doc_id"], r["logw_ppm"], r["rank"]) for r in out}


def test_bigram_nll_separates_gibberish_from_formulaic(spark):
    """Corpus-fit bigram LM: unseen-transition gibberish must score a
    higher mean NLL than docs made of corpus-frequent bigrams; docs
    with < 2 tokens carry NULL avg_nll with zero counts."""
    from data_quality_check_spark.operators.corpus import bigram_nll_score

    common = "the cat sat on the mat"
    rows = [(i, common) for i in range(10)]
    rows += [(50, "zq xv jk wp mn bt")]       # gibberish: unique bigrams
    rows += [(60, "single")]                   # too short to score
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_nll_score(df).collect()}
    assert out[60]["n_bigrams"] == 0 and out[60]["avg_nll"] is None
    assert out[0]["n_bigrams"] == 5 and out[50]["n_bigrams"] == 5
    assert out[50]["avg_nll"] > out[0]["avg_nll"]
    # identical docs score identically (pure function of the corpus)
    assert all(out[i]["nll_ppm_sum"] == out[0]["nll_ppm_sum"]
               for i in range(10))


def test_contamination_sweep_monotone_in_n(spark):
    """Longer n-grams can only match less: contaminated count and
    mean overlap fraction are nonincreasing in n, and every rate is a
    valid fraction."""
    from data_quality_check_spark.queries import q_text_contamination_sweep

    rows = sorted(q_text_contamination_sweep(
        spark, "/root/testdata/sf0.001").collect(), key=lambda r: r["n"])
    assert [r["n"] for r in rows] == [3, 5, 8]
    cont = [r["n_contaminated"] for r in rows]
    frac = [r["mean_contam_frac"] for r in rows]
    assert cont == sorted(cont, reverse=True)
    assert frac == sorted(frac, reverse=True)
    for r in rows:
        assert 0 <= r["contaminated_rate"] <= 1
        assert r["n_docs"] > 0


def test_effective_corpus_size_known_structure(spark):
    """Diversity indices on a corpus with a KNOWN cluster structure
    (3 copies of A, 2 of B, 1 unique): dedup_ratio 3/6, inverse
    Simpson 36/14, Shannon effective size exp(H) — all vs closed-form
    numpy."""
    import math

    from data_quality_check_spark.operators.corpus import (
        effective_corpus_size)

    texts = (["alpha beta gamma delta epsilon zeta"] * 3
             + ["one two three four five six seven"] * 2
             + ["lone wolf document with unique words"])
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    row = effective_corpus_size(df, "text", "doc_id").collect()[0]
    assert row["n_docs"] == 6 and row["n_clusters"] == 3
    assert row["dedup_ratio"] == 0.5
    assert row["simpson_eff"] == round(36 / 14, 6)
    h = (3 / 6) * math.log(6 / 3) + (2 / 6) * math.log(6 / 2) \
        + (1 / 6) * math.log(6 / 1)
    # per-group 1e-9 floor quantization of the entropy terms
    h9 = sum(math.floor(t * 1e9) for t in
             [(3 / 6) * math.log(6 / 3), (2 / 6) * math.log(6 / 2),
              (1 / 6) * math.log(6 / 1)])
    assert row["shannon_eff"] == round(math.exp(h9 / 1e9), 6)
    assert abs(row["shannon_eff"] - math.exp(h)) < 1e-6


def test_effective_corpus_size_no_dups_is_identity(spark):
    """All-unique corpus: every index equals the document count."""
    from data_quality_check_spark.operators.corpus import (
        effective_corpus_size)

    texts = [f"totally unique words number{i} payload{i * 7} tail{i}"
             for i in range(5)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    row = effective_corpus_size(df, "text", "doc_id").collect()[0]
    assert row["n_docs"] == 5 and row["n_clusters"] == 5
    assert row["dedup_ratio"] == 1.0
    assert row["simpson_eff"] == 5.0
    assert abs(row["shannon_eff"] - 5.0) < 1e-5


def test_curriculum_order_is_total_and_tiered(spark):
    """global_pos is exactly 1..N, every tier-1 row precedes every
    tier-2 row, and the order is partitioning-invariant (pure
    function of the rows)."""
    from data_quality_check_spark.operators.corpus import curriculum_order

    rows = [(i, 1 + (i % 3)) for i in range(97)]
    df = spark.createDataFrame(rows, "doc_id long, tier int")
    out = curriculum_order(df, "tier", "doc_id").toPandas()
    assert sorted(out.global_pos) == list(range(1, 98))
    by_id = out.set_index("doc_id")
    t1 = out[out.tier == 1].global_pos.max()
    t2 = out[out.tier == 2].global_pos
    assert (t2 > t1).all()
    out2 = (curriculum_order(df.repartition(7), "tier", "doc_id")
            .toPandas().set_index("doc_id"))
    assert (by_id.global_pos == out2.global_pos.reindex(by_id.index)).all()


def test_token_budget_plan_largest_remainder_exact(spark):
    """Known allocation: budget 10 over token masses (7, 5, 3):
    bases floor(10*t/15) = (4, 3, 2) = 9, one leftover unit goes to
    the largest remainder (7*10=70, rem 70-60=10; 50-45=5; 30-30=0)
    -> quotas (5, 3, 2) summing exactly to 10; budget >= total keeps
    everything."""
    from data_quality_check_spark.operators.corpus import token_budget_plan

    rows = [("a", 7), ("b", 5), ("c", 3)]
    df = spark.createDataFrame(rows, "src string, ntok int")
    out = {r["src"]: r for r in
           token_budget_plan(df, "src", F.col("ntok"), 10).collect()}
    assert {k: v["quota_tokens"] for k, v in out.items()} == \
        {"a": 5, "b": 3, "c": 2}
    assert sum(v["quota_tokens"] for v in out.values()) == 10
    full = token_budget_plan(df, "src", F.col("ntok"), 100).collect()
    assert all(r["quota_tokens"] == r["group_tokens"] for r in full)
    assert all(r["keep_frac"] == 1.0 for r in full)


def test_token_budget_plan_decimal_rounding_trigger(spark):
    """Exact-floor regression at the decimal(38,0)/decimal(38,0)
    rounding trigger: Spark's lossy decimal division rounds HALF_UP
    at scale 6, so a true fractional part >= 0.9999995 used to round
    UP before floor (base off by one vs exact integer //).  Group a:
    t = 10^10 - 1 of T = 10^10 with budget 4000 -> b*t/T =
    3999.9999996; exact base 3999 + the leftover unit by largest
    remainder = 4000, and every intermediate must match pure-Python
    integer arithmetic (the DuckDB HUGEINT // oracle semantics)."""
    from data_quality_check_spark.operators.corpus import token_budget_plan

    t_a, t_b, budget = 10_000_000_000 - 1, 1, 4000
    rows = [("a", t_a), ("b", t_b)]
    df = spark.createDataFrame(rows, "src string, ntok long")
    out = {r["src"]: r for r in
           token_budget_plan(df, "src", F.col("ntok"), budget).collect()}
    # pure-Python exact largest remainder
    tot = t_a + t_b
    base = {"a": budget * t_a // tot, "b": budget * t_b // tot}
    rem = {k: budget * t for k, t in rows}
    rem = {k: budget * dict(rows)[k] - base[k] * tot for k in base}
    left = budget - sum(base.values())
    order = sorted(base, key=lambda k: (-rem[k], k))
    exact = {k: base[k] + (1 if order.index(k) < left else 0)
             for k in base}
    assert {k: v["quota_tokens"] for k, v in out.items()} == exact
    assert sum(v["quota_tokens"] for v in out.values()) == budget


def test_token_budget_plan_zero_token_group(spark):
    """A group whose rows carry zero tokens gets quota 0 and
    keep_frac 1.0 (trivially all kept) — not a 0/0 NaN/NULL that
    would split engines — and never steals remainder units."""
    from data_quality_check_spark.operators.corpus import token_budget_plan

    rows = [("a", 7), ("b", 5), ("z", 0)]
    df = spark.createDataFrame(rows, "src string, ntok int")
    out = {r["src"]: r for r in
           token_budget_plan(df, "src", F.col("ntok"), 10).collect()}
    assert out["z"]["quota_tokens"] == 0
    assert out["z"]["keep_frac"] == 1.0
    assert out["a"]["quota_tokens"] + out["b"]["quota_tokens"] == 10
