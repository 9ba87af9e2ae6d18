"""Golden-label oracle equivalence (SURVEY.md §5.2; the correctness
gate of BASELINE.json:2,14): the distributed Spark pipeline must match
the pure-pandas reference oracle — keep/drop F1 >= 0.99 (target 1.0),
scrubbed captions exactly equal, pixel invariant exact."""

from __future__ import annotations

import numpy as np


def test_row_alignment(pipeline_results, oracle_labels):
    assert len(pipeline_results) == len(oracle_labels)
    assert (pipeline_results.image_id.to_numpy()
            == oracle_labels.image_id.to_numpy()).all()


def test_keep_f1(pipeline_results, oracle_labels):
    p = pipeline_results.keep.to_numpy()
    t = oracle_labels.keep.to_numpy()
    tp = int((p & t).sum())
    fp = int((p & ~t).sum())
    fn = int((~p & t).sum())
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, f"F1 {f1} below floor"
    assert f1 == 1.0, "rules are deterministic; expect exact agreement"


def test_drop_reasons_exact(pipeline_results, oracle_labels):
    for a, b in zip(pipeline_results.drop_reasons, oracle_labels.drop_reasons):
        assert list(a) == list(b)


def test_lang_and_ppl(pipeline_results, oracle_labels):
    assert (pipeline_results.lang.to_numpy()
            == oracle_labels.lang.to_numpy()).all()
    assert np.allclose(pipeline_results.lang_conf.to_numpy(),
                       oracle_labels.lang_conf.to_numpy(), rtol=0, atol=0)
    assert np.allclose(pipeline_results.ppl.to_numpy(),
                       oracle_labels.ppl.to_numpy(), rtol=0, atol=0)


def test_scrubbed_caption_exact(pipeline_results, oracle_labels):
    a = pipeline_results.caption_scrubbed
    b = oracle_labels.caption_scrubbed
    assert (a.fillna("\0") == b.fillna("\0")).all()


def test_scrub_hits_exact(pipeline_results, oracle_labels):
    for a, b in zip(pipeline_results.scrub_hits, oracle_labels.scrub_hits):
        assert dict(a or {}) == dict(b or {})


def test_pixel_invariant(pipeline_results, oracle_labels, images_pdf):
    assert (pipeline_results.pixel_ok.to_numpy()
            == oracle_labels.pixel_ok.to_numpy()).all()
    # lossless formats decode exactly => inf; lossy rawq rows carry a
    # finite decoder-fidelity PSNR
    ok = pipeline_results.pixel_ok.to_numpy()
    psnr = pipeline_results.psnr_db.to_numpy()
    fmts = (images_pdf.sort_values("image_id").reset_index(drop=True)
            ["fmt"].to_numpy())
    lossless = fmts != "rawq"
    assert np.isinf(psnr[ok & lossless]).all()
    assert np.isfinite(psnr[ok & ~lossless]).all()


def test_keep_rate_sane(oracle_labels):
    # the generator seeds ~35-40% violations; keep rate must be in a
    # plausible band, not degenerate
    rate = oracle_labels.keep.mean()
    assert 0.4 < rate < 0.85, rate


def test_text_only_path_has_verdict(spark):
    """enrich(with_decode=False) must still reach a keep decision
    (pixel flags default to pass) — code-review regression."""
    from data_quality_check_spark.plans import pipeline as P
    from data_quality_check_spark.sources import images as IM

    df = IM.read_images(spark, 0.001)
    out = P.results_select(P.decide(P.enrich(df, with_decode=False)))
    pdf = out.limit(50).toPandas()
    assert len(pdf) == 50
    assert pdf.pixel_ok.all()


def test_lossy_psnr_branch_live(oracle_labels, pipeline_results, images_pdf):
    """The regenerated fixture carries rawq rows: finite psnr must
    appear, v1 rows pass the 40 dB gate, v2 rows are dropped as
    pixel_invalid — in BOTH the oracle and the pipeline."""
    import numpy as np

    fmts = images_pdf.sort_values("image_id").reset_index(drop=True)["fmt"]
    assert (fmts == "rawq").sum() > 0, "fixture must contain rawq rows"
    psnr = pipeline_results["psnr_db"].to_numpy()
    finite = np.isfinite(psnr)
    assert finite.any(), "finite PSNR rows must exist (lossy decode)"
    # pipeline and oracle agree on every finite PSNR to 6 decimals
    opsnr = oracle_labels["psnr_db"].to_numpy()
    assert (np.isfinite(opsnr) == finite).all()
    assert np.allclose(psnr[finite], opsnr[finite], atol=1e-6)
    # both regimes observed: some finite rows above the gate (kept
    # unless another rule fires) and some below (always dropped)
    from data_quality_check_spark.constants import MIN_PSNR_DB, RULE_PIXEL
    below = finite & (psnr < MIN_PSNR_DB)
    above = finite & (psnr >= MIN_PSNR_DB)
    assert below.any() and above.any()
    reasons = pipeline_results["drop_reasons"]
    assert all(RULE_PIXEL in reasons.iloc[i] for i in np.nonzero(below)[0])
    assert not any(RULE_PIXEL in reasons.iloc[i] for i in np.nonzero(above)[0])
