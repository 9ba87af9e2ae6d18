"""Expected-label fixtures for the UDF-dependent contract keys.

DuckDB cannot run the langid / perplexity / scrub / decode kernels,
so those keys were rows-only checked.  This module runs the SAME
pure-pandas reference oracle the F1 gate trusts
(data_quality_check_spark/oracle.py::evaluate — bit-exact vs the
pipeline per tests/test_pipeline_vs_oracle.py) over the deterministic
corpora WITHOUT Spark, and writes the expected outputs as
generate-once parquet; the SQL oracles SELECT the pinned values.
That graduates `keep_decision_images`, `udf_decode`, `udf_langid`,
`udf_perplexity`, `udf_scrub` and `agg_bucket_metrics` from rows-only
to value-checked: what the pin verifies is the DISTRIBUTED execution
(Arrow round-trips, fused-UDF batching, flag->verdict expressions,
bucket assignment) against the single-process reference.

Deterministic caches — DELETE data/labels_* / data/decode_* /
data/doc_* after touching any kernel, sources/images.py, or the rule
constants.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from .constants import N_BUCKETS, RULE_ORDER
from .operators.multimodal import _round6


def _round2(v):
    """Spark round(double, 2) twin incl. special values (Spark's
    round passes NaN / +-Inf through unchanged)."""
    import decimal

    if v is None:
        return None
    f = float(v)
    if f != f or f in (float("inf"), float("-inf")):
        return f
    return float(decimal.Decimal(repr(f)).quantize(
        decimal.Decimal("0.01"), rounding=decimal.ROUND_HALF_UP))


def _scrub_hits_str(d) -> str:
    if not d:
        return ""
    return ",".join(f"{k}:{int(d[k])}" for k in sorted(d))


def _bucket(ph) -> int:
    if pd.isna(ph):
        ph = 0
    return int(ph) % N_BUCKETS  # pmod: nonneg for nonneg inputs


def ensure_label_fixtures(sf: float = 0.01,
                          root: str = "/root/repo/data",
                          testdata_dir: str = "/root/testdata/sf0.01",
                          ) -> dict[str, str]:
    """Generate-once; returns {name: path}."""
    import pyarrow.parquet as pq

    paths = {
        "labels": os.path.join(root, f"labels_sf{sf:g}.parquet"),
        "decode": os.path.join(root, f"decode_sf{sf:g}.parquet"),
        "doc_langid": os.path.join(root, f"doc_langid_sf{sf:g}.parquet"),
        "doc_ppl": os.path.join(root, f"doc_ppl_sf{sf:g}.parquet"),
        "doc_scrub": os.path.join(root, f"doc_scrub_sf{sf:g}.parquet"),
    }
    if all(os.path.exists(p) for p in paths.values()):
        return paths

    from .kernels import codecs
    from .kernels.langid import classify
    from .kernels.ppl import perplexity
    from .kernels.scrub import scrub_series
    from .oracle import evaluate
    from .sources.images import generate_pandas

    os.makedirs(root, exist_ok=True)

    def _write(path: str, frame: pd.DataFrame) -> None:
        import pyarrow as pa

        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(frame, preserve_index=False),
                       tmp)
        os.replace(tmp, path)

    # ---- images: pipeline verdict + decode metrics -------------------
    pdf = generate_pandas(sf)
    lab = evaluate(pdf)
    labels = pd.DataFrame({
        "image_id": lab["image_id"],
        "bucket": np.array([_bucket(p) for p in pdf["phash"]],
                           dtype=np.int32),
        "lang": lab["lang"],
        "lang_conf": [_round6(v) for v in lab["lang_conf"]],
        "ppl": [_round6(v) for v in lab["ppl"]],
        "keep": lab["keep"].astype(bool),
        "drop_reasons": ["|".join(r) for r in lab["drop_reasons"]],
        "rule_flags": np.array(
            [sum(1 << i for i, name in enumerate(RULE_ORDER)
                 if name in set(r))
             for r in lab["drop_reasons"]], dtype=np.int32),
        "caption_scrubbed": lab["caption_scrubbed"],
        "scrub_hits": [_scrub_hits_str(d) for d in lab["scrub_hits"]],
        "pixel_ok": lab["pixel_ok"].astype(bool),
    })
    _write(paths["labels"], labels)

    # decode metrics mirror functions/udfs.py::_decode_batch exactly
    n = len(pdf)
    ok = np.zeros(n, dtype=bool)
    psnr = np.full(n, np.nan)
    w_real = np.zeros(n, dtype=np.int32)
    h_real = np.zeros(n, dtype=np.int32)
    ph_real = np.zeros(n, dtype=np.int64)
    for i in range(n):
        b = pdf["bytes"].iloc[i]
        if b is None:
            continue
        try:
            pix = codecs.decode(b, pdf["fmt"].iloc[i],
                                int(pdf["w"].iloc[i]),
                                int(pdf["h"].iloc[i]))
        except Exception:
            continue
        h_real[i], w_real[i] = pix.shape[0], pix.shape[1]
        ph_real[i] = codecs.ahash64(pix)
        phv = pdf["phash"].iloc[i]
        ok[i] = (h_real[i] == int(pdf["h"].iloc[i])
                 and w_real[i] == int(pdf["w"].iloc[i])
                 and not pd.isna(phv) and ph_real[i] == int(phv))
        if ok[i]:
            try:
                ref = codecs.decode_ref(b, pdf["fmt"].iloc[i],
                                        w_real[i], h_real[i])
                psnr[i] = (np.inf if ref is None
                           else codecs.psnr_db(pix, ref))
            except Exception:
                pass
    _write(paths["decode"], pd.DataFrame({
        "image_id": pdf["image_id"],
        "pixel_ok": ok,
        "w_real": w_real, "h_real": h_real, "phash_real": ph_real,
        "psnr_db": np.array([_round2(v) for v in psnr], dtype=np.float64),
    }))

    # ---- documents: kernel outputs -----------------------------------
    docs = pq.read_table(
        os.path.join(testdata_dir, "documents.parquet")).to_pandas()
    text = docs["text"]
    lid = classify(text)
    _write(paths["doc_langid"], pd.DataFrame({
        "doc_id": docs["doc_id"],
        "lang": lid["lang"],
        "lang_conf": [_round6(v) for v in lid["lang_conf"]],
    }))
    _write(paths["doc_ppl"], pd.DataFrame({
        "doc_id": docs["doc_id"],
        "ppl": [_round6(v) for v in perplexity(text)],
    }))
    sc = scrub_series(text)
    _write(paths["doc_scrub"], pd.DataFrame({
        "doc_id": docs["doc_id"],
        "scrubbed": sc["caption_scrubbed"],
        "toxic": sc["toxic"].astype(bool),
    }))
    return paths
