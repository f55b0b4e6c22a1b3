"""Query surface: importing this package populates the registry.

Each module is one SURVEY.md section-2 category. Every query is a
``(spark, sf_dir) -> DataFrame`` callable registered with a DuckDB
oracle where ANSI-SQL-expressible.
"""

from . import (  # noqa: F401
    advanced,
    audit,
    curation,
    dedup,
    graph,
    inference,
    inference_order,
    ir,
    lakehouse,
    mining,
    mining_behavioral,
    mining_graph,
    mining_layout,
    mining_text,
    mlprep,
    mlprep_supervised,
    multimodal,
    pipeline,
    privacy,
    probe,
    pruning,
    quality,
    quality_sketch,
    reference,
    relational,
    similarity,
    temporal,
    text,
    timeseries,
    tokenizer,
    tpch,
    udfs,
)
