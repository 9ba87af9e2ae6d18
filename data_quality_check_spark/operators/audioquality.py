"""Per-clip audio quality rules — the audio modality's twin of
operators/imgquality.py, completing the driver instruction's
multimodal-column contract with a REAL (not stubbed) decode path:
PCM-WAV parses from scratch (kernels/audio.py), so the whole
decode -> statistics -> rules -> verdict chain runs end-to-end
in-sandbox; only the codec-dependent formats (mp3/ogg — ffmpeg)
remain honestly stubbed in operators/multimodal.py.

Spark-first split, same as the image side:

* metadata gates (duration floor from stored n_samples/sr) are pure
  JVM column expressions — no decode, pushdown-friendly;
* sample statistics need the decoded waveform, so they run in ONE
  fused Arrow pandas UDF (decode + every statistic in a single
  ArrowEvalPython stage), sharing kernels/audio.py verbatim with the
  numpy fixture oracle (parity by construction).

Scale notes (10^12 clips): the UDF projects (bytes, sr) and emits 8
scalar doubles — the payload dies at the map stage and never crosses
an Exchange; rules and the verdict are per-row map-side expressions,
so the operator is shuffle-free and scales with input splits.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..constants import (
    AUDIO_CLIP_FRAC_MAX,
    AUDIO_DC_FRAC_MAX,
    AUDIO_MIN_DURATION_S,
    AUDIO_SILENCE_FRAC_MAX,
    AUDIO_SILENCE_RMS_DB,
)

AUDIOSTATS_SCHEMA = StructType([
    StructField("decoded", BooleanType()),
    StructField("n_samples", IntegerType()),
    StructField("duration_s", DoubleType()),
    StructField("rms_db", DoubleType()),
    StructField("peak_frac", DoubleType()),
    StructField("clip_frac", DoubleType()),
    StructField("silence_frac", DoubleType()),
    StructField("dc_frac", DoubleType()),
    StructField("zcr", DoubleType()),
    StructField("spectral_centroid_hz", DoubleType()),
])

STAT_COLS = [f.name for f in AUDIOSTATS_SCHEMA.fields][2:]

# (rule name, stat column, threshold, keep-iff) — single source for
# the Spark expressions, the numpy oracle and the tests.
AUDIO_RULES: list[tuple[str, str, float, str]] = [
    ("duration_ok", "duration_s", AUDIO_MIN_DURATION_S, "ge"),
    ("loudness_ok", "rms_db", AUDIO_SILENCE_RMS_DB, "ge"),
    ("clip_ok", "clip_frac", AUDIO_CLIP_FRAC_MAX, "le"),
    ("silence_ok", "silence_frac", AUDIO_SILENCE_FRAC_MAX, "le"),
    ("dc_ok", "dc_frac", AUDIO_DC_FRAC_MAX, "le"),
]
RULE_COLS = [name for name, *_ in AUDIO_RULES]


def _stats_batch(blob: pd.Series) -> pd.DataFrame:
    """Decode + all statistics for one Arrow batch.  Shared by the
    Spark UDF and the fixture oracle (expected_audioquality).  The
    sample rate comes from the decoded RIFF header — the claimed sr
    metadata column is never consulted (decoded value is
    authoritative, same discipline as n_samples), so it is not in the
    UDF signature and never crosses Arrow."""
    from ..kernels.audio import audio_stats, decode_wav

    n = len(blob)
    out = {
        "decoded": np.zeros(n, dtype=bool),
        "n_samples": np.zeros(n, dtype=np.int32),
        "duration_s": np.full(n, np.nan),
        "rms_db": np.full(n, np.nan),
        "peak_frac": np.full(n, np.nan),
        "clip_frac": np.full(n, np.nan),
        "silence_frac": np.full(n, np.nan),
        "dc_frac": np.full(n, np.nan),
        "zcr": np.full(n, np.nan),
        "spectral_centroid_hz": np.full(n, np.nan),
    }
    blobs = blob.to_numpy()
    for i in range(n):
        b = blobs[i]
        if b is None:
            continue
        try:
            wav_sr, x = decode_wav(bytes(b))
        except ValueError:
            continue
        st = audio_stats(x, wav_sr)
        out["decoded"][i] = True
        out["n_samples"][i] = st["n_samples"]
        for k in STAT_COLS:
            out[k][i] = st[k]
    return pd.DataFrame(out)


@pandas_udf(AUDIOSTATS_SCHEMA)
def audiostats_udf(
    it: Iterator[pd.Series],
) -> Iterator[pd.DataFrame]:
    """bytes -> audio quality statistics.  One fused ArrowEvalPython
    stage: the clip ships to Python exactly once and every statistic
    comes back as a scalar double."""
    for blob in it:
        yield _stats_batch(blob)


def with_audio_quality(audio: DataFrame) -> DataFrame:
    """Attach waveform statistics, per-rule booleans and the audio
    keep verdict.  Undecodable rows fail every rule; a rule passes
    only for a DECODED clip inside the threshold (NaN-explicit, the
    imgquality null discipline)."""
    # the claimed n_samples metadata column is superseded by the
    # decoded stats struct's field of the same name — drop it with
    # the payload so the output has ONE authoritative n_samples
    st = audio.withColumn(
        "s", audiostats_udf("bytes")).select(
        *[c for c in audio.columns if c not in ("bytes", "n_samples")],
        "s.*")
    for name, stat, thr, mode in AUDIO_RULES:
        cmp = (F.col(stat) >= F.lit(thr)) if mode == "ge" \
            else (F.col(stat) <= F.lit(thr))
        st = st.withColumn(
            name, F.when(F.col("decoded") & ~F.isnan(stat), cmp)
                   .otherwise(F.lit(False)))
    keep = F.col("decoded")
    for name in RULE_COLS:
        keep = keep & F.col(name)
    return st.withColumn("audio_keep", keep)


def quality_report(quality: DataFrame) -> DataFrame:
    """One-row corpus report over a with_audio_quality frame: decode
    success count, per-rule failure counts, keep count and rate.  One
    map-side partial-aggregate pass — the UDF already reduced each
    clip to scalars."""
    aggs = [F.count("*").alias("n_clips"),
            F.sum(F.col("decoded").cast("long")).alias("n_decoded")]
    for c in RULE_COLS:
        aggs.append(F.sum((~F.col(c)).cast("long"))
                    .alias(f"bad_{c[:-3]}"))
    aggs.append(F.sum(F.col("audio_keep").cast("long")).alias("n_keep"))
    aggs.append(F.round(F.avg(F.col("audio_keep").cast("double")), 6)
                 .alias("keep_rate"))
    return quality.agg(*aggs)


def expected_audioquality(sf: float,
                          root: str = "/root/repo/data") -> str:
    """Driver-side numpy oracle for the value pin: run the SAME
    kernel over the deterministic corpus WITHOUT Spark and write the
    expected per-clip output as generate-once parquet (the
    expected_imgquality pattern).  The pin verifies the distributed
    execution: Arrow round-trips, fused-UDF batching, NaN/NULL rule
    semantics and the verdict expressions.

    Generate-once cache — DELETE data/audioquality_* (and data/
    audio_*) after touching kernels/audio.py, sources/audio.py or
    the AUDIO_* constants."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..sources.audio import generate_pandas
    from .multimodal import _round6

    path = os.path.join(root, f"audioquality_sf{sf:g}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(root, exist_ok=True)
    pdf = generate_pandas(sf)
    st = _stats_batch(pdf["bytes"])

    out = pd.DataFrame({"clip_id": pdf["clip_id"]})
    out["decoded"] = st["decoded"].to_numpy()
    out["n_samples"] = st["n_samples"].to_numpy().astype(np.int32)
    for k in STAT_COLS:
        vals = st[k].to_numpy()
        out[k] = [None if not d or np.isnan(v) else _round6(v)
                  for d, v in zip(out["decoded"], vals)]
    dec = out["decoded"].to_numpy()
    keep = dec.copy()
    for name, stat, thr, mode in AUDIO_RULES:
        vals = st[stat].to_numpy()
        finite = dec & ~np.isnan(vals)
        ok = np.zeros(len(out), dtype=bool)
        if mode == "ge":
            ok[finite] = vals[finite] >= thr
        else:
            ok[finite] = vals[finite] <= thr
        out[name] = ok
        keep = keep & ok
    out["audio_keep"] = keep

    tmp = path + ".tmp"
    pq.write_table(pa.Table.from_pandas(out, preserve_index=False), tmp)
    os.replace(tmp, path)
    return path


# NB the return type must be a TYPE OBJECT, not the "long" DDL
# string: a string is parsed lazily via the active SparkContext, and
# the PYTHON WORKER re-imports this module with no context -> every
# OTHER udf in the module dies with SESSION_OR_CONTEXT_NOT_EXISTS
@pandas_udf(LongType())
def audiofp_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """bytes -> 64-bit spectral fingerprint (kernels/audio.py::
    audio_fingerprint64); NULL for undecodable blobs."""
    from ..kernels.audio import audio_fingerprint64, decode_wav

    for blob in it:
        vals = []
        for b in blob.to_numpy():
            if b is None:
                vals.append(None)
                continue
            try:
                sr, x = decode_wav(bytes(b))
            except ValueError:
                vals.append(None)
                continue
            vals.append(audio_fingerprint64(x, sr))
        yield pd.Series(vals, dtype="object").astype("Int64")


def audio_fingerprints(audio: DataFrame) -> DataFrame:
    """(clip_id, afp): one fingerprint per decodable clip — the
    persisted audio dedup index (the phash twin for the audio
    modality)."""
    return (audio
            .select("clip_id", audiofp_udf("bytes").alias("afp"))
            .filter(F.col("afp").isNotNull()))


def audio_fingerprint_dups(audio: DataFrame,
                           max_hamming: int = 3) -> DataFrame:
    """Audio near-dup pairs: the SAME guaranteed-recall pigeonhole
    band index as the visual pipeline (dedup.phash_near_dups is
    hash-agnostic) over spectral fingerprints — catches volume-scaled
    re-encodes the exact byte digest structurally misses (the sign of
    a temporal energy delta is gain-invariant)."""
    from .dedup import phash_near_dups

    return phash_near_dups(audio_fingerprints(audio), max_hamming,
                           id_col="clip_id", phash_col="afp")


def expected_audiofp(sf: float, root: str = "/root/repo/data") -> str:
    """Numpy fixture oracle for the fingerprint pin: (clip_id, afp)
    for every decodable clip, same kernel, no Spark.  Generate-once
    cache — DELETE data/audiofp_* with the other audio caches."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..kernels.audio import audio_fingerprint64, decode_wav
    from ..sources.audio import generate_pandas

    path = os.path.join(root, f"audiofp_sf{sf:g}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(root, exist_ok=True)
    pdf = generate_pandas(sf)
    rows = []
    for clip_id, blob in zip(pdf["clip_id"], pdf["bytes"]):
        try:
            sr, x = decode_wav(bytes(blob))
        except ValueError:
            continue
        rows.append({"clip_id": clip_id,
                     "afp": audio_fingerprint64(x, sr)})
    tbl = pa.Table.from_pylist(
        rows, schema=pa.schema([("clip_id", pa.string()),
                                ("afp", pa.int64())]))
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path
