"""Column profiler (operators/dq.py::column_profile) vs a pandas
reference.  The four table-level analyzers are covered in
test_dq_analyzers.py."""

from __future__ import annotations


def test_column_profile_matches_pandas(spark):
    """Profiler metrics vs a pandas reference on a frame with nulls,
    a constant column, and mixed types."""
    import numpy as np
    import pandas as pd
    from data_quality_check_spark.operators.dq import column_profile

    pdf = pd.DataFrame({
        "k": [1, 2, 2, 3, None],
        "s": ["aa", None, "bbbb", "aa", "c"],
        "const": [7.5] * 5,
    })
    sdf = spark.createDataFrame(pdf.astype({"k": "object"}))
    out = (column_profile(sdf, ["k", "s", "const"])
           .toPandas().set_index("column"))
    assert (out.total == 5).all()
    assert out.loc["k", "n_null"] == 1 and out.loc["k", "null_frac"] == 0.2
    assert out.loc["k", "n_distinct"] == 3
    assert out.loc["k", "mean_numeric"] == 2.0
    assert out.loc["k", "min_numeric"] == 1.0
    assert out.loc["k", "max_numeric"] == 3.0
    assert np.isnan(out.loc["k", "avg_len"])
    assert out.loc["s", "n_distinct"] == 3          # 'aa' repeats
    assert out.loc["s", "avg_len"] == 2.25          # (2+4+2+1)/4
    assert np.isnan(out.loc["s", "mean_numeric"])
    assert out.loc["const", "n_distinct"] == 1
    assert out.loc["const", "mean_numeric"] == 7.5


def test_split_contamination_planted_pair(spark):
    """A planted eval near-copy is flagged with the right offender;
    a clean eval row reports 0 / NULLs through the left join."""
    from data_quality_check_spark.operators.dq import split_contamination

    base = [1.0] * 8
    rows_t = [
        (10, [v + 0.01 for v in base]),        # near-copy of eval 1
        (11, [1.0, -1.0] * 4),                 # orthogonal-ish
        (12, [v + 0.02 for v in base]),        # second near-copy
    ]
    rows_e = [
        (1, base),
        (2, [-1.0, 1.0] * 4),                  # clean: no train match
    ]
    t = spark.createDataFrame(rows_t, "vec_id long, embedding array<double>")
    e = spark.createDataFrame(rows_e, "vec_id long, embedding array<double>")
    out = {r["eval_id"]: r
           for r in split_contamination(t, e, threshold=0.95).collect()}
    assert out[1]["n_contaminating"] == 2
    assert out[1]["worst_train_id"] == 10   # higher cos than 12
    assert out[1]["is_contaminated"] and out[1]["max_cos"] >= 0.99
    assert out[2]["n_contaminating"] == 0
    assert out[2]["max_cos"] is None
    assert out[2]["worst_train_id"] is None
    assert not out[2]["is_contaminated"]
