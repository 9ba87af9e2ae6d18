"""data_quality_check_spark — a from-scratch PySpark-native
data-quality / quality-filter engine with the capabilities of
TrendingAnamika/data-quality-check (reference: 2-line README at
/root/reference/README.md — "test Data Quality for Big Size data
within seconds"), realized per BASELINE.json as a language-ID +
quality-filter + PII/toxicity-scrub pipeline over image+caption
tables.  See SURVEY.md for the full blueprint."""

__version__ = "0.1.0"
