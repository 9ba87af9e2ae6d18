"""Trained text classifiers for the quality/langid pipeline.

The north-star pipeline calls for fastText-style language
identification.  This module implements the classical counterpart a
Spark cluster can TRAIN and SCORE fully distributed with zero Python
in the hot path: a multinomial Naive Bayes over token unigrams.
fastText's model (bag-of-token linear classifier, quantized weights)
degenerates to exactly this shape for unigram features, and the
mechanics — build a weight table from grouped counts, score documents
by summing weights — are the same mechanics a productionized
fastText-scoring job has (broadcast the weight table, sum per doc).

Cross-engine determinism device (also how fastText ships its .ftz
models): log weights are QUANTIZED to integer micro-log units
(floor(ln(p) * 1e6 + 0.5)).  Integer sums are associative — the score
of a document is independent of partition boundaries, accumulation
order, and engine (Spark vs DuckDB agree bit-for-bit), which float
log-prob sums are NOT (pairwise vs sequential summation changes the
last ulp and can flip an argmax near a tie).  The only float op left
is one ln() per DISTINCT (token, lang) pair at train time; a last-ulp
ln difference only matters if it crosses a floor boundary (~1e-10 per
weight).

Scale shape (10^12 docs):
- train: explode -> two hash aggregations shuffling (lang, token)
  COUNTS only (map-side combine); the weight table is V x L rows.
- score: per-doc token counts join the weight table on token.  For a
  natural-language vocab the table broadcasts (even 10M rows of
  (token, lang, int64) is ~hundreds of MB; below that AQE picks the
  broadcast side automatically).  For adversarial/unbounded vocabs,
  pass hash_buckets to fold tokens into a fixed-width md5 bucket
  space first (fastText's hashing trick) — the table is then bounded
  by buckets x L regardless of corpus size.
- argmax: one window over |langs| rows per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANTUM = 1_000_000.0  # micro-log units


def _qlog(col):
    """floor(ln(x) * 1e6 + 0.5) as BIGINT — identical in DuckDB SQL."""
    return F.floor(F.log(col) * F.lit(QUANTUM) + F.lit(0.5)).cast("long")


def _bucket(tok_col, buckets: int):
    """md5-prefix token bucket (fastText hashing trick); md5 agrees
    across Spark/DuckDB unlike xxhash64."""
    return F.conv(F.substring(F.md5(tok_col), 1, 8), 16, 10
                  ).cast("long") % buckets


def nb_langid(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", label_col: str = "lang",
              hash_buckets: int = 0) -> DataFrame:
    """Train + score a multinomial NB language classifier in one
    lazy plan.  Returns one row per document: (id, true label,
    predicted label, correct, margin_micro) where margin_micro is the
    integer micro-log gap between the best and second-best language —
    a calibrated-ish confidence the pipeline can threshold on.

    Add-1 smoothing over the global vocab; documents with zero tokens
    fall back to the prior argmax.  Ties break on lang ascending (the
    scores are exact integers, so the tiebreak is deterministic)."""
    toks_expr = F.filter(F.split(F.col(text_col), " "),
                         lambda t: t != F.lit(""))
    base = docs.select(F.col(id_col).alias("id"),
                       F.col(label_col).alias("label"),
                       toks_expr.alias("__toks"))
    tok = base.select("id", "label", F.explode("__toks").alias("tok"))
    if hash_buckets > 0:
        tok = tok.withColumn("tok", _bucket(F.col("tok"), hash_buckets)
                             .cast("string"))

    # ---- train: integer count tables (shuffles carry counts only)
    cnt = tok.groupBy("label", "tok").agg(F.count("*").alias("c"))
    vocab = cnt.select(F.countDistinct("tok").alias("__v"))
    den = cnt.groupBy("label").agg(F.sum("c").alias("den"))
    ndocs = docs.agg(F.count("*").alias("__n"))
    prior_cnt = (docs.groupBy(F.col(label_col).alias("label"))
                 .agg(F.count("*").alias("nd")))
    langdim = (prior_cnt.join(den, "label")
               .crossJoin(F.broadcast(vocab))
               .crossJoin(F.broadcast(ndocs))
               .select(
                   "label",
                   _qlog(F.col("nd").cast("double") / F.col("__n"))
                   .alias("prior_q"),
                   # unseen-token weight: ln(1 / (den + V))
                   _qlog(F.lit(1.0) / (F.col("den") + F.col("__v")))
                   .alias("def_q"),
                   (F.col("den") + F.col("__v")).alias("__denv")))
    w = (cnt.join(langdim.select("label", "__denv"), "label")
         .select("label", "tok",
                 _qlog((F.col("c") + F.lit(1.0)) / F.col("__denv"))
                 .alias("w_q")))

    # ---- score: per-doc token counts x langs, left join weights
    tc = tok.groupBy("id", "tok").agg(F.count("*").alias("n"))
    contrib = (tc.crossJoin(F.broadcast(
                   langdim.select("label", "def_q")
                   .withColumnRenamed("label", "cand")))
               .join(w.withColumnRenamed("label", "cand"),
                     ["cand", "tok"], "left")
               .groupBy("id", "cand")
               .agg(F.sum(F.col("n")
                          * F.coalesce("w_q", "def_q")).alias("s_q")))
    scored = (base.select("id", "label")
              .crossJoin(F.broadcast(
                  langdim.select(F.col("label").alias("cand"),
                                 "prior_q")))
              .join(contrib, ["id", "cand"], "left")
              .withColumn("score_q",
                          F.coalesce("s_q", F.lit(0)) + F.col("prior_q")))
    ww = Window.partitionBy("id").orderBy(F.desc("score_q"),
                                          F.asc("cand"))
    return (scored
            .withColumn("rk", F.row_number().over(ww))
            .withColumn("margin_micro",
                        F.col("score_q")
                        - F.coalesce(F.lead("score_q", 1).over(ww),
                                     F.col("score_q")))
            .filter(F.col("rk") == 1)
            .select(F.col("id").alias("doc_id"),
                    F.col("label").alias("lang"),
                    F.col("cand").alias("pred_lang"),
                    (F.col("cand") == F.col("label")).alias("correct"),
                    "margin_micro"))
