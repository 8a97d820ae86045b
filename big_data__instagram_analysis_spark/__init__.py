"""big_data__instagram_analysis_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first implementation of the query/data-processing
surface of ``whimpe/Big-Data--Instagram-Analysis`` (log-analytics /
social-data DataFrame workload), plus the LLM-data-pipeline extension
(dedup, similarity search, multimodal columns, text analysis).

The reference repo was unreadable at survey time (SURVEY.md §0); the binding
specification is SURVEY.md §2's operator inventory and the driver contract in
``__spark_entry__.py``. Everything here is public PySpark 4.x API.

Layout:
    session.py    SparkSession factory + runtime tuning applied per query
    io.py         fixture loaders, temp-view registration, sinks
    registry.py   @query decorator pairing each Spark impl with DuckDB oracle SQL
    queries/      registered query definitions (thin; call into operators/)
    operators/    composite operators (as-of join, dedup, similarity, sessionize)
    sources/      file format readers/writers (csv/json/parquet/partitioned)
    functions/    scalar-function helpers and the UDF surface
    streaming/    Structured Streaming harness + streaming queries
    plans/        explain/plan-inspection helpers
"""

__version__ = "0.1.0"

from .registry import get_oracles, get_queries, get_specs  # noqa: F401
