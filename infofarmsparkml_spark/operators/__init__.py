"""Operator modules — importing this package runs every
``@query`` decorator and populates the registry.

Module list grows as SURVEY.md §2 families land; keep imports
explicit so a broken module fails loudly at registration time.
"""

from infofarmsparkml_spark.operators import (  # noqa: F401
    aggregates,
    etl,
    filters,
    graph,
    joins,
    llm,
    llm_curation,
    matching,
    ml,
    multimodal,
    pandas_api,
    pipeline,
    pysource,
    retrieval,
    scans,
    setops,
    sorts,
    subqueries,
    timeseries,
    tpch,
    udfs,
    windows,
)
