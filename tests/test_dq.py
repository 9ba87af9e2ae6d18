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
