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
  interval joins, inner AND left-outer (null emission gated on
  watermark expiry) — the streaming analogs of the batch range join.
- sketches: continuously-maintained CMS counters, HLL registers and
  bloom bitmaps (fixed-size state however long the stream runs).
- merge: foreachBatch CDC merge into versioned parquet snapshots
  (latest-wins with retained tombstones, stage-then-swap publication).
- scd2: foreachBatch SCD2 history maintenance on the same store.
- stateful: custom per-key state via ``applyInPandasWithState``
  (running user stats; the *_exact variant certifiable vs batch SQL).
- windows also ships ``windowed_counts_with_late_drop``, the
  two-phase watermark late-data-drop certification harness.
"""

from data_pipeline_childcare_spark.streaming.ingest import stream_record_blocks, incremental_ingest
from data_pipeline_childcare_spark.streaming.windows import (
    windowed_event_counts,
    streaming_sessions,
)
from data_pipeline_childcare_spark.streaming.dedup_join import (
    streaming_dedup,
    stream_stream_click_purchase,
    stream_stream_click_purchase_left,
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
from data_pipeline_childcare_spark.streaming.stateful import (
    running_user_stats,
    running_user_stats_exact,
)
from data_pipeline_childcare_spark.streaming.windows import (
    windowed_counts_with_late_drop,
)
