"""Scalar function packs (SURVEY.md §2.8, F1-F8) — importing this
package registers every pack's queries."""

from infofarmsparkml_spark.functions import (  # noqa: F401
    collections_fns,
    datetime_fns,
    numeric,
    text,
)
