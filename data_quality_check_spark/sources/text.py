"""JSONL / CSV ingest for caption-corpus tables.

Web-scale corpora arrive as line-delimited text (JSONL crawl dumps,
CSV manifests); parquet is the curated layout this engine writes.
Scale rules baked in here:

- **Explicit schema only.**  ``inferSchema``/``read_json_auto`` is a
  second full pass over the input — at 100 TB that doubles scan cost
  before the first real job runs.  Both readers take a DDL schema.
- **Line-splittable layouts only.**  Newline-delimited JSON and
  single-line CSV records split by byte range (Hadoop
  ``LineRecordReader``), so ONE large file still parallelizes across
  every executor.  Quoted-newline (multiline) CSV serializes the scan
  to one task; therefore the CSV surface carries scalar metadata
  columns only, and free text (which may contain newlines) rides
  JSONL, where the format escapes them.
- **PERMISSIVE + corrupt-record audit.**  A crawl shard with a torn
  line must flag the row, not kill the job (same contract as the
  image decode UDF): ``read_jsonl`` keeps Spark's default PERMISSIVE
  mode and exposes the standard ``_corrupt_record`` column on demand.

The ``data/docs_*`` files are deterministic caches derived from the
driver fixture ``documents.parquet`` (ORDER BY doc_id at write); they
exist so the DuckDB oracle can read the byte-identical file the Spark
side reads.  Delete them if the fixtures change.
"""

from __future__ import annotations

import os

import duckdb
from pyspark.sql import DataFrame, SparkSession

DATA_ROOT = "/root/repo/data"

# text column lives here: JSON escapes embedded newlines so the file
# stays line-splittable
DOCS_JSONL_DDL = ("doc_id BIGINT, text STRING, lang STRING, "
                  "source STRING, n_chars BIGINT")
# scalar metadata only: CSV with quoted newlines would not split
DOCS_CSV_DDL = "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT"


def docs_jsonl_path(sf: float, root: str = DATA_ROOT) -> str:
    return os.path.join(root, f"docs_sf{sf:g}.jsonl")


def docs_csv_path(sf: float, root: str = DATA_ROOT) -> str:
    return os.path.join(root, f"docs_meta_sf{sf:g}.csv")


def _docs_parquet(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def ensure_docs_jsonl(sf: float, sf_dir: str, root: str = DATA_ROOT) -> str:
    """Write-once JSONL cache of the documents fixture (deterministic:
    ORDER BY doc_id, single file)."""
    path = docs_jsonl_path(sf, root)
    if not os.path.exists(path):
        os.makedirs(root, exist_ok=True)
        tmp = path + ".tmp"
        duckdb.connect().execute(
            f"COPY (SELECT doc_id, text, lang, source, n_chars "
            f"FROM '{_docs_parquet(sf_dir)}' ORDER BY doc_id) "
            f"TO '{tmp}' (FORMAT JSON)")
        os.replace(tmp, path)  # atomic: no torn cache on interrupt
    return path


def ensure_docs_csv(sf: float, sf_dir: str, root: str = DATA_ROOT) -> str:
    path = docs_csv_path(sf, root)
    if not os.path.exists(path):
        os.makedirs(root, exist_ok=True)
        tmp = path + ".tmp"
        duckdb.connect().execute(
            f"COPY (SELECT doc_id, lang, source, n_chars "
            f"FROM '{_docs_parquet(sf_dir)}' ORDER BY doc_id) "
            f"TO '{tmp}' (FORMAT CSV, HEADER)")
        os.replace(tmp, path)
    return path


def read_jsonl(spark: SparkSession, path: str,
               schema: str = DOCS_JSONL_DDL,
               with_corrupt: bool = False) -> DataFrame:
    """Line-delimited JSON scan with an explicit schema.

    ``with_corrupt=True`` appends Spark's ``_corrupt_record`` column:
    torn/invalid lines arrive as rows with the raw line there and
    nulls elsewhere — audit them, never crash on them.
    """
    ddl = schema + (", _corrupt_record STRING" if with_corrupt else "")
    return spark.read.schema(ddl).json(path)


def read_csv(spark: SparkSession, path: str,
             schema: str = DOCS_CSV_DDL) -> DataFrame:
    """Header CSV scan with an explicit schema; multiLine stays False
    (the default) so the input splits by byte range."""
    return spark.read.schema(schema).option("header", True).csv(path)
