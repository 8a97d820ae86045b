"""Query definitions. Importing this package registers every query.

Module ↔ SURVEY.md §2 section map:
    core.py            A1-A3, A6, A10, O1-O3 (flagship + relational core)
    projections.py     P1-P6
    joins.py           J1-J10 (as-of in operators/asof.py)
    aggregates.py      A4, A5, A7-A9
    windows.py         W1-W6
    setops.py          T1-T4
    scalars.py         F1-F9
    sources_sinks.py   S1-S9
    llm_text.py        L4, L6, L8 + text-analysis extension
    llm_dedup.py       L1, L2 + simhash/ngram-jaccard extension
    llm_similarity.py  L3 + ANN extension
    llm_multimodal.py  L7 + binary-column extension
    udfs.py            U1-U6
    streaming.py       X1-X8
"""

# Explicit imports — a module that fails to import must fail LOUDLY here,
# not silently drop its queries from the driver contract.
from . import (  # noqa: F401
    advanced,
    aggregates,
    analytics_ext,
    bucketing,
    core,
    curation,
    dataframe_ops,
    joins,
    linalg,
    llm_audit,
    llm_dedup,
    llm_multimodal,
    llm_similarity,
    llm_text,
    ops_gates,
    pipeline_ops,
    projections,
    retrieval,
    runtime,
    scalars,
    scalars_ext,
    scale_ops,
    setops,
    social,
    sources_meta,
    sources_sinks,
    streaming,
    subqueries,
    tpch_deep,
    udfs,
    windows,
)
