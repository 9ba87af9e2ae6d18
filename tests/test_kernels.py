"""Text-kernel unit tests: langid, perplexity, scrub, heuristics —
hand-computed expectations on tiny literal inputs (SURVEY.md §5.1)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from data_quality_check_spark.constants import (
    LANGS,
    MAX_PPL,
    WORD_POOLS,
)
from data_quality_check_spark.kernels.langid import classify
from data_quality_check_spark.kernels.ppl import PPL_SHORT, perplexity
from data_quality_check_spark.kernels.scrub import scrub_series
from data_quality_check_spark.kernels.text import heuristic_stats


def test_langid_on_pool_sentences():
    rng = np.random.default_rng(5)
    rows, truths = [], []
    for lang in LANGS:
        pool = WORD_POOLS[lang]
        for _ in range(100):
            rows.append(" ".join(rng.choice(pool, 10)))
            truths.append(lang)
    res = classify(pd.Series(rows))
    acc = (res["lang"].to_numpy() == np.array(truths)).mean()
    assert acc > 0.97


def test_langid_gibberish_is_und():
    rng = np.random.default_rng(6)
    import string
    rows = ["".join(rng.choice(list(string.ascii_lowercase + string.digits), 30))
            for _ in range(100)]
    res = classify(pd.Series(rows))
    assert (res["lang"] == "und").mean() > 0.9


def test_langid_empty_and_null():
    res = classify(pd.Series(["", None, "ab"]))
    assert list(res["lang"]) == ["und", "und", "und"]


def test_ppl_separates_real_from_gibberish():
    real = " ".join(WORD_POOLS["en"][:20])
    gib = "qzxjvkwpfy zzkkqqxxjj wvutsrqpon"
    p = perplexity(pd.Series([real, gib, "", "ab"]))
    assert p[0] < MAX_PPL < p[1]
    assert p[2] == PPL_SHORT and p[3] == PPL_SHORT


def test_ppl_batch_order_invariance():
    texts = [" ".join(WORD_POOLS["fr"][:12]), "hello world", "zq"]
    a = perplexity(pd.Series(texts))
    b = perplexity(pd.Series(texts[::-1]))[::-1]
    assert np.allclose(a, b, rtol=0, atol=0)


def test_scrub_cases():
    out = scrub_series(pd.Series([
        "mail a@b.co now",
        "ip 10.1.2.3 end",
        "see https://x.org/a?b=1 ok",
        "ssn 123-45-6789",
        "card 1234 5678 9012 3456",
        "call +44 123 4567 89",
        "you gorram fool",
        None,
        "clean",
    ]))
    s = out["caption_scrubbed"].tolist()
    assert s[0] == "mail <EMAIL> now"
    assert s[1] == "ip <IP> end"
    assert s[2] == "see <URL> ok"
    assert s[3] == "ssn <SSN>"
    assert s[4] == "card <CC>"
    assert s[5] == "call <PHONE>"
    assert s[6] == "you <TOX> fool"
    assert s[7] is None
    assert s[8] == "clean"
    assert out["toxic"].tolist() == [False] * 6 + [True, False, False]
    assert out["scrub_hits"][0] == {"email": 1}
    assert out["scrub_hits"][8] == {}


def test_scrub_idempotent_on_examples():
    texts = pd.Series(["mail a@b.co and c@d.org", "tel +1 234 5678 99 x"])
    once = scrub_series(texts)["caption_scrubbed"]
    twice = scrub_series(once)["caption_scrubbed"]
    assert list(once) == list(twice)


def test_heuristic_stats():
    df = heuristic_stats(pd.Series([
        "the cat sat on the mat",        # clean
        "a a a a a a a a",               # repetition (1 distinct / 8)
        "!!! ??? $$$ %%%",               # symbols
        "",                              # empty
        None,                            # null
    ]))
    assert df.n_tokens.tolist() == [6, 8, 4, 0, 0]
    assert df.repetition_bad.tolist() == [False, True, False, False, False]
    assert df.symbol_bad.tolist() == [False, False, True, False, False]
    # row 0 stopwords: the, on, the => 3/6
    assert abs(df.stopword_ratio[0] - 3 / 6) < 1e-12


def test_astral_and_space_edge_cases():
    """Non-BMP chars (emoji) must flow through every kernel without
    error and map to <unk> in the models; all-space texts tokenize to
    nothing."""
    import pandas as pd

    texts = pd.Series([
        "🙂🙂🙂 nice 🙂 photo of the beach",
        "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𝔪𝔞𝔱𝔥 𝔰𝔱𝔶𝔩𝔢",
        "     ",
        "的 🙂 是",
    ])
    lid = classify(texts)
    assert list(lid["lang"].index) == [0, 1, 2, 3]
    p = perplexity(texts)
    assert len(p) == 4 and all(x > 0 for x in p)
    s = scrub_series(texts)
    assert s["caption_scrubbed"][0].count("🙂") == 4  # scrub keeps emoji
    stats = heuristic_stats(texts)
    assert stats.n_tokens[2] == 0
    # emoji count as symbols
    assert stats.symbol_density[0] > 0

def test_unicode_whitespace_symbol_parity():
    """U+00A0 / U+3000 / \\x0b captions: the symbol class uses an
    explicit ASCII whitespace set so Python re, Java regex and RE2
    all count the same symbols (ADVICE r1: `\\s` differs per engine).
    Unicode spaces deliberately count as symbols everywhere."""
    texts = pd.Series([
        "the cat\u00a0sat on the mat",  # NBSP => 1 symbol
        "the cat\u3000sat on the mat",  # ideographic space => 1 symbol
        "the cat\x0bsat on the mat",     # VT: ASCII ws => 0 symbols
        "the cat\tsat on the mat",       # tab => 0 symbols
    ])
    stats = heuristic_stats(texts)
    assert stats.symbol_density.tolist() == [
        1 / len(texts[0]), 1 / len(texts[1]), 0.0, 0.0]


def test_unicode_whitespace_three_engine_parity(spark):
    """Same captions through the Spark Column rule and DuckDB regex —
    all three engines must agree with the Python kernel."""
    import duckdb
    from pyspark.sql import functions as F

    from data_quality_check_spark.constants import ALLOWED_CHAR_CLASS
    from data_quality_check_spark.functions import rules as R

    texts = ["a b c", "a\u00a0b c", "a\u3000b c", "a\x0bb c", "a\tb c", "a ! c"]
    expected = heuristic_stats(pd.Series(texts)).symbol_density.tolist()

    sdf = spark.createDataFrame([(t,) for t in texts], "caption string")
    got_spark = [
        r[0] for r in sdf.select(
            R.symbol_density(F.col("caption"))).collect()
    ]
    assert got_spark == expected

    con = duckdb.connect()
    got_duck = [
        con.execute(
            "SELECT length(regexp_replace(?, '" + ALLOWED_CHAR_CLASS + "', '', 'g'))"
            " / CAST(length(?) AS DOUBLE)", [t, t]).fetchone()[0]
        for t in texts
    ]
    assert got_duck == expected
