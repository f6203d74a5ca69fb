"""Pipeline plans — the reference's three entry-point lifecycles
(SURVEY.md §3) recomposed as lazy DataFrame transformations.

- search_plan: query generation / site+time filter assembly (§3.1)
- scrape: content parse → clean → group-by-origin (§3.2)
- retrieval: the flagship rule-filter (Tuoyu) and RRF/rerank/top-k
  (X-Pilot) query paths (§3.3)
"""

from data_pipeline_childcare_spark.plans.search_plan import build_search_queries
from data_pipeline_childcare_spark.plans.scrape import scrape_pipeline
from data_pipeline_childcare_spark.plans.retrieval import (
    enrich_chunks_with_doc_meta,
    tuoyu_rule_filter,
    xpilot_retrieval,
)
from data_pipeline_childcare_spark.plans.survey_rag import survey_to_markdown
