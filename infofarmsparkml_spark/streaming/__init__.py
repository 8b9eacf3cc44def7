"""Structured Streaming operators (SURVEY.md §2.9) — importing
registers the T1-T7 queries."""

from infofarmsparkml_spark.streaming import ops  # noqa: F401
