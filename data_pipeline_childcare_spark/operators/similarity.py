"""Similarity search over embedding columns (ARRAY<FLOAT>).

Two paths:
- brute-force cosine top-k: the correctness baseline. Queries are a
  SMALL set → broadcast them against the corpus; score is pure column
  math (zip_with dot product); top-k via windowed row_number. One
  narrow pass over the corpus + one shuffle for the window.
- LSH-bucketed (random hyperplane signs): the scale path. Corpus and
  queries are hashed to sign-pattern buckets; candidate set = same
  bucket (multi-probe by hamming-adjacent buckets optional); exact
  re-score only within candidates. At 100 TB the corpus pass stays a
  scan + narrow transform; the join is keyed by bucket hash.

No MLlib dependency: hyperplanes are generated deterministically from
a seed with xxhash64-derived pseudo-randoms, so results are
reproducible across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0).cast("double"), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    ``queries`` must be small (it is crossJoin-broadcast against the
    corpus). Returns (query_id, vec_id, cosine_sim, rank). Excludes
    self-matches when ids collide.
    """
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6).alias("cosine_sim"),
    )
    scored = scored.filter(F.col(query_id_col) != F.col(id_col))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine_sim"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane(dim: int, plane_idx: int, seed: int = 42) -> list[float]:
    """Deterministic pseudo-random hyperplane component values in [-1,1]
    derived from a splitmix-style integer mix — reproducible anywhere."""
    out = []
    for d in range(dim):
        x = (plane_idx * 1_000_003 + d * 7_919 + seed) & 0xFFFFFFFFFFFFFFFF
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
        x = x ^ (x >> 31)
        out.append((x % 2_000_001) / 1_000_000.0 - 1.0)
    return out


def lsh_bucket(vec_col: Column, dim: int, n_planes: int = 12, seed: int = 42) -> Column:
    """Random-hyperplane LSH bucket id: sign bits packed into a BIGINT."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, p, seed)])
        bit = F.when(_dot(vec_col, plane) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(F.shiftleft(bit, p))
    return bucket


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate cosine top-k: candidates share the LSH bucket, exact
    re-score within candidates only.

    Recall/cost dial = n_planes (more planes → smaller buckets). The
    corpus-side bucket computation is a narrow projection; the
    candidate join is an equi-join on the bucket id.
    """
    c = corpus.withColumn("_bucket", lsh_bucket(F.col(vec_col), dim, n_planes))
    q = queries.withColumn("_bucket", lsh_bucket(F.col(query_vec_col), dim, n_planes))
    cand = c.join(F.broadcast(q), "_bucket").select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6).alias("cosine_sim"),
    )
    cand = cand.filter(F.col(query_id_col) != F.col(id_col))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine_sim"), F.col(id_col))
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def label_centroids(
    embeddings: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label centroid vector: posexplode → avg per (label, pos) →
    re-assemble ordered array. One shuffle keyed by (label, pos)."""
    exploded = embeddings.select(
        F.col(label_col), F.posexplode(F.col(vec_col)).alias("pos", "v")
    )
    per_pos = exploded.groupBy(label_col, "pos").agg(F.avg("v").alias("mean_v"))
    return per_pos.groupBy(label_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mean_v"))), lambda s: s["mean_v"]
        ).alias("centroid")
    )
