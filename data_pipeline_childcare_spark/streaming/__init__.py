"""Structured Streaming surface.

The reference has no streaming (SURVEY.md §2.9) — its only incremental
behavior is scrape pagination. This module supplies the streaming
analogs a production deployment of the same pipelines needs:

- ingest: Auto-Loader-style incremental corpus ingest (file stream →
  parse → foreachBatch through the batch cleaning pipeline).
- windows: event-time windowed aggregation + session windows with
  watermarked late-data handling (the streaming analog of the batch
  ``sessionize`` operator).
- dedup_join: watermarked streaming dedup
  (``dropDuplicatesWithinWatermark``) and stream-stream event-time
  interval joins (the streaming analog of the batch range join).
"""

from data_pipeline_childcare_spark.streaming.ingest import stream_record_blocks, incremental_ingest
from data_pipeline_childcare_spark.streaming.windows import (
    windowed_event_counts,
    streaming_sessions,
)
from data_pipeline_childcare_spark.streaming.dedup_join import (
    streaming_dedup,
    stream_stream_click_purchase,
)
from data_pipeline_childcare_spark.streaming.sketches import (
    streaming_bloom_words,
    streaming_cms_counters,
    streaming_hll_registers,
)
from data_pipeline_childcare_spark.streaming.merge import (
    merge_change_log,
    read_merged,
    streaming_merge_to_path,
)
from data_pipeline_childcare_spark.streaming.scd2 import (
    read_scd2_history,
    streaming_scd2_to_path,
)
