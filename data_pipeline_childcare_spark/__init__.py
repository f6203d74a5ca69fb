"""data_pipeline_childcare_spark — a PySpark-native analytics engine.

A brand-new engine re-expressing the query and data-processing
capabilities of the reference repo (Vampxgg/data-pipeline-childcare, a
single-process asyncio Python pipeline) as idiomatic Spark
DataFrame/SQL jobs, plus the LLM-training-data operators a 100 TB
pipeline needs (dedup, similarity search, text analysis, multimodal
columns).

Design stance (SURVEY.md §7.1):
- Declarative logical plans (DataFrame/SQL); Catalyst + AQE pick the
  physical strategy. No RDDs.
- Column-expression library for everything expressible without Python
  row code; Arrow-batched pandas UDFs only for parse/repair edges.
- Small dimensions are broadcast; big joins shuffle on their keys with
  AQE skew handling; filters and projections are written to push down
  into the parquet scan.
"""

from data_pipeline_childcare_spark.session import get_spark
from data_pipeline_childcare_spark.io import load_table, load_tables

__all__ = ["get_spark", "load_table", "load_tables"]

__version__ = "0.1.0"
