"""Video-script timeline math (SURVEY.md §2.4 A9, §2.5 W5).

Re-expresses dify_transformation.py as window math over scene rows:

- outline: running sum of scene durations → absolute start/end per
  scene, MM:SS formatted (extract_outline, :120-167);
- subtitle absolute-time repair: a subtitle whose raw start is BEFORE
  its scene's absolute start is relative → shift by the scene offset
  (extract_subtitles, :193-208);
- the reference's recursive scene-list discovery (find_scenes, :57-91)
  disappears: scenes arrive as typed rows via ``from_json`` with a
  declared schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_childcare_spark.functions.dates import seconds_to_mmss

SCENE_SCHEMA = (
    "array<struct<id string, type string, title string,"
    " estimated_duration_seconds double, duration double,"
    " scene_knowledge string, target string, subtitle string,"
    " subtitles array<struct<id string, start_time_seconds double,"
    " end_time_seconds double, text string>>>>"
)


def scenes_from_json(df: DataFrame, json_col: str, video_col: str = "video_id") -> DataFrame:
    """Script JSON → one row per scene with a 0-based scene index.

    Accepts the `{"scenes": [...]}` wrapper or a bare scene array —
    the declared-schema replacement for the reference's recursive
    find_scenes heuristic."""
    wrapped = F.from_json(F.col(json_col), f"struct<scenes:{SCENE_SCHEMA}>")["scenes"]
    bare = F.from_json(F.col(json_col), SCENE_SCHEMA)
    return df.select(
        video_col, F.posexplode(F.coalesce(wrapped, bare)).alias("scene_idx", "scene")
    )


def _scene_duration() -> F.Column:
    # duration fallback chain (reference :125-128)
    return F.coalesce(
        F.when(F.col("scene.estimated_duration_seconds") != 0, F.col("scene.estimated_duration_seconds")),
        F.col("scene.duration"),
        F.lit(0.0),
    )


def outline(scenes: DataFrame, video_col: str = "video_id") -> DataFrame:
    """Cumulative timeline per video: startTime/endTime from the
    running duration sum (A9), with the reference's title/description
    fallback chains."""
    w = (
        Window.partitionBy(video_col)
        .orderBy("scene_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    dur = _scene_duration()
    start = F.coalesce(F.sum(dur).over(w), F.lit(0.0))
    title = F.when(F.col("scene.title") != "", F.col("scene.title")).otherwise(
        F.when(
            F.coalesce(F.col("scene.type"), F.lit("normal")) == "normal",
            F.format_string("场景 %d", F.col("scene_idx") + 1),
        ).otherwise(F.initcap(F.col("scene.type")))
    )
    description = F.coalesce(
        F.when(F.col("scene.scene_knowledge") != "", F.col("scene.scene_knowledge")),
        F.when(F.col("scene.target") != "", F.col("scene.target")),
        F.when(F.col("scene.subtitle") != "", F.col("scene.subtitle")),
        # try_element_at: ANSI mode makes element_at THROW on an empty
        # subtitles array
        F.substring(F.try_element_at(F.col("scene.subtitles"), F.lit(1))["text"], 1, 50),
        F.lit(""),
    )
    return scenes.select(
        video_col,
        F.coalesce(F.col("scene.id"), F.format_string("scene_%d", F.col("scene_idx"))).alias("id"),
        (F.col("scene_idx") + 1).alias("index"),
        title.alias("title"),
        description.alias("description"),
        F.concat(dur.cast("string"), F.lit("s")).alias("duration"),
        seconds_to_mmss(start).alias("startTime"),
        seconds_to_mmss(start + dur).alias("endTime"),
        dur.alias("raw_duration"),
    )


def subtitles(scenes: DataFrame, video_col: str = "video_id") -> DataFrame:
    """Per-subtitle absolute times with the relative-time repair (W5):
    raw_start < scene_start ⇒ relative ⇒ shift by the scene offset;
    the end follows the duration when computable."""
    w = (
        Window.partitionBy(video_col)
        .orderBy("scene_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scene_start = F.coalesce(F.sum(_scene_duration()).over(w), F.lit(0.0))
    # scene_start must be computed over ALL scene rows; exploding first
    # would run the window over subtitle-bearing rows only
    with_start = scenes.select(
        video_col, "scene_idx", scene_start.alias("scene_start"), "scene"
    )
    exploded = with_start.select(
        video_col,
        "scene_idx",
        "scene_start",
        F.explode(F.col("scene.subtitles")).alias("sub"),
    )
    raw_start = F.coalesce(F.col("sub.start_time_seconds"), F.lit(0.0))
    raw_end = F.coalesce(F.col("sub.end_time_seconds"), F.lit(0.0))
    is_abs = raw_start >= F.col("scene_start")
    abs_start = F.when(is_abs, raw_start).otherwise(F.col("scene_start") + raw_start)
    abs_end = F.when(is_abs, raw_end).otherwise(
        F.when(raw_end - raw_start > 0, abs_start + (raw_end - raw_start)).otherwise(
            F.col("scene_start") + raw_end
        )
    )
    return (
        exploded.select(
            video_col,
            F.col("sub.id").alias("id"),
            seconds_to_mmss(abs_start).alias("startTime"),
            seconds_to_mmss(abs_end).alias("endTime"),
            F.coalesce(F.col("sub.text"), F.lit("")).alias("text"),
            abs_start.alias("_raw_start"),
        )
        .orderBy(video_col, "_raw_start")
        .drop("_raw_start")
    )
