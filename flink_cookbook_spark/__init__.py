"""flink_cookbook_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference streaming application (vpatnana/flink-cookbook, a PyFlink SARIMAX
anomaly-detection job — see SURVEY.md), re-expressed Spark-first:

- **Relational core (batch)**: the full DataFrame/SQL surface (scans, joins,
  aggregations, window functions, set ops, top-k, scalar function packs),
  each registered with a DuckDB oracle for correctness checking.
- **Streaming recipes (Structured Streaming)**: the reference pipeline
  (source -> parse -> keyed 5-min window agg -> stateful baseline model ->
  latest-value join -> alert filter -> sink) with event-time watermarks.
  Every streaming op has a batch twin built from the same expressions.
- **LLM-data-pipeline extensions**: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard), embedding similarity search, text analysis, and
  multimodal-column plumbing — designed for 100 TB scale.

Design stance (SURVEY.md section 7): declare logical plans with the
DataFrame/SQL API and let Catalyst/Tungsten pick the physical strategy;
drop to Arrow-batched pandas UDFs only where built-ins cannot express the
semantics (the per-key time-series model operator).
"""

from flink_cookbook_spark.session import get_spark
from flink_cookbook_spark.registry import all_queries, all_oracles, get_query

__all__ = ["get_spark", "all_queries", "all_oracles", "get_query"]

__version__ = "0.1.0"
