"""Visual risk gates (watermark / NSFW / aesthetic stand-ins):
kernel exactness on constructed images, Spark-vs-numpy-oracle parity
(shared kernel => exact float equality), rule/verdict semantics, and
plan shapes (ONE fused ArrowEvalPython; `bytes` never crosses an
Exchange)."""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_check_spark import constants as C
from data_quality_check_spark.kernels.imgrisk import risk_stats


def _rgb(gray2d: np.ndarray) -> np.ndarray:
    g = gray2d.astype(np.uint8)
    return np.stack([g, g, g], axis=-1)


# ---------------------------------------------------------------------------
# kernel exactness on constructed images
# ---------------------------------------------------------------------------

def test_white_bottom_strip_is_watermark():
    # 16x16 gradient-ish base, bottom 2 rows (h//8 = 2) pure white:
    # every strip pixel is near-white low-sat -> wm_strip_frac 1.0;
    # the bottom-right 4x4 corner is half white -> 0.5
    g = np.tile(np.arange(16, dtype=np.uint8) * 8, (16, 1))
    pix = _rgb(g)
    pix[14:, :, :] = 255
    st = risk_stats(pix)
    assert st["wm_strip_frac"] == 1.0
    assert st["wm_corner_frac"] == 0.5
    assert st["skin_frac"] == 0.0  # white fails sat > 15


def test_constant_skin_tone_image():
    # (150, 80, 40): passes every Kovac condition -> skin_frac 1.0,
    # and is neither near-white nor low-sat -> wm fracs 0
    pix = np.zeros((8, 8, 3), dtype=np.uint8)
    pix[..., 0], pix[..., 1], pix[..., 2] = 150, 80, 40
    st = risk_stats(pix)
    assert st["skin_frac"] == 1.0
    assert st["wm_strip_frac"] == 0.0
    assert st["wm_corner_frac"] == 0.0


def test_constant_gray_aesthetic_zero():
    # constant 128: zero entropy / contrast / colorfulness, flat 1.0
    st = risk_stats(_rgb(np.full((16, 16), 128)))
    assert st["aesthetic"] == 0.0
    assert st["wm_strip_frac"] == 0.0  # 128 < near-white floor
    assert st["skin_frac"] == 0.0


def test_pure_white_flags_both_wm_regions():
    st = risk_stats(_rgb(np.full((16, 16), 255)))
    assert st["wm_strip_frac"] == 1.0
    assert st["wm_corner_frac"] == 1.0
    assert st["aesthetic"] == 0.0


def test_tiny_image_regions_are_nonempty():
    # h=2: strip = max(1, 2//8) = 1 row; corner = 1x1 — no div-by-zero
    st = risk_stats(_rgb(np.full((2, 3), 255)))
    assert st["wm_strip_frac"] == 1.0
    assert st["wm_corner_frac"] == 1.0


# ---------------------------------------------------------------------------
# Spark vs numpy oracle: exact parity via the shared kernel
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def risk_pdf(spark):
    from data_quality_check_spark.operators.imgscore import with_image_risk
    from data_quality_check_spark.sources import images as IM

    out = with_image_risk(IM.read_images(spark, 0.001))
    return out.toPandas().sort_values("image_id").reset_index(drop=True)


def test_spark_risk_matches_numpy_oracle_exactly(risk_pdf, images_pdf):
    from data_quality_check_spark.operators.imgscore import _risk_batch

    exp = _risk_batch(images_pdf["bytes"], images_pdf["fmt"],
                      images_pdf["w"], images_pdf["h"])
    exp.insert(0, "image_id", images_pdf["image_id"])
    exp = exp.sort_values("image_id").reset_index(drop=True)
    assert (risk_pdf["decoded"] == exp["decoded"]).all()
    for c in ("wm_strip_frac", "wm_corner_frac", "skin_frac",
              "aesthetic"):
        a = risk_pdf[c].to_numpy()
        b = exp[c].to_numpy()
        same = (a == b) | (np.isnan(a) & np.isnan(b))
        assert same.all(), c  # bit-exact, not approx


def test_risk_rules_and_verdict(risk_pdf):
    p = risk_pdf
    dec = p["decoded"].to_numpy()
    for c in ("wm_strip_ok", "wm_corner_ok", "skin_ok", "aesthetic_ok",
              "risk_keep"):
        assert not p.loc[~dec, c].any()
    # thresholds applied to the full-precision stats
    finite = dec & ~np.isnan(p["skin_frac"].to_numpy())
    exp_ok = np.zeros(len(p), dtype=bool)
    exp_ok[finite] = (p.loc[finite, "skin_frac"]
                      <= C.IMG_SKIN_MAX).to_numpy()
    assert (p["skin_ok"].to_numpy() == exp_ok).all()
    # verdict == conjunction of all gates
    conj = dec.copy()
    for c in ("wm_strip_ok", "wm_corner_ok", "skin_ok", "aesthetic_ok"):
        conj &= p[c].to_numpy()
    assert (p["risk_keep"].to_numpy() == conj).all()
    # calibration sanity: each gate fires on a nonempty minority tail
    for c in ("wm_strip_ok", "wm_corner_ok", "skin_ok", "aesthetic_ok"):
        bad = (~p[c]).mean()
        assert 0.0 < bad < 0.35, (c, bad)
    assert 0.5 < p["risk_keep"].mean() < 0.95


# ---------------------------------------------------------------------------
# plan shapes
# ---------------------------------------------------------------------------

def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_risk_query_single_python_stage_no_bytes_shuffle(spark):
    from data_quality_check_spark.queries import REGISTRY

    plan = _plan(REGISTRY["image_risk_stats"][0](
        spark, "/root/testdata/sf0.001"))
    assert plan.count("ArrowEvalPython (") == 1  # ONE fused stage
    ex_lines = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert all("bytes" not in ln for ln in ex_lines)


def test_risk_report_partial_aggregate(spark):
    from data_quality_check_spark.queries import REGISTRY

    plan = _plan(REGISTRY["agg_image_risk"][0](
        spark, "/root/testdata/sf0.001"))
    assert plan.count("ArrowEvalPython (") == 1
    assert "partial" in plan.lower()  # map-side combine
    ex_lines = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert all("bytes" not in ln for ln in ex_lines)


def test_keep_decision_all_joins_scalars_only(spark):
    from data_quality_check_spark.queries import REGISTRY

    plan = _plan(REGISTRY["keep_decision_all"][0](
        spark, "/root/testdata/sf0.001"))
    ex_lines = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert all("bytes" not in ln for ln in ex_lines)
    assert all("caption" not in ln for ln in ex_lines)


def test_fixture_oracle_roundtrip(tmp_path):
    import pyarrow.parquet as pq

    from data_quality_check_spark.operators.imgscore import expected_imgrisk

    path = expected_imgrisk(0.001, root=str(tmp_path))
    t = pq.read_table(path).to_pandas()
    assert len(t) == 1000
    assert t["decoded"].sum() > 900
    assert (t.loc[~t["decoded"], "risk_keep"] == False).all()  # noqa: E712
    assert t.loc[~t["decoded"], "aesthetic"].isna().all()
