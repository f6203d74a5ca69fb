"""Markdown image-reference handling (SURVEY.md §2.1 S15, §2.3 J6).

The reference extracts embedded images, uploads them, and rewrites
`data:` URIs / local refs to served URLs (多数据源获取数据.py:352-445,
1078-1178), matching filenames case-insensitively with and without
extension (J6, :1156-1177). The upload itself is a side-effect sink
(connector concern); the dataflow parts — ref extraction, the ≤25 cap,
and the rewrite joins — are pure column ops here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_IMG_RE = r"!\[[^\]]*\]\(([^)\s]+)[^)]*\)"

MAX_IMAGE_REFS = 25  # reference cap (多数据源获取数据.py:571)


def extract_image_refs(col: Column | str, cap: int = MAX_IMAGE_REFS) -> Column:
    """All markdown image URLs in reading order, capped → ARRAY<STRING>."""
    c = F.col(col) if isinstance(col, str) else col
    return F.slice(F.regexp_extract_all(c, F.lit(_IMG_RE), 1), 1, cap)


def _name_key(url: Column) -> Column:
    """Case-insensitive basename without extension (J6 match key)."""
    base = F.element_at(F.split(url, "/"), -1)
    return F.lower(F.regexp_replace(base, r"\.[A-Za-z0-9]+$", ""))


def rewrite_image_refs(
    docs: DataFrame,
    uploads: DataFrame,
    text_col: str = "text",
    name_col: str = "filename",
    url_col: str = "served_url",
) -> DataFrame:
    """Rewrite local/inline image refs to uploaded URLs.

    ``uploads`` is a small (filename, served_url) dim: it becomes a
    literal replacement pass via an exploded broadcast join — one
    narrow projection over the docs, the uploads side broadcast.
    """
    up = uploads.select(
        _name_key(F.col(name_col)).alias("_key"), F.col(url_col).alias("_served")
    )
    refs = docs.select(
        "*", F.explode_outer(extract_image_refs(F.col(text_col))).alias("_ref")
    ).withColumn("_ref_key", _name_key(F.col("_ref")))
    joined = refs.join(F.broadcast(up), refs["_ref_key"] == up["_key"], "left")
    # fold the per-doc (ref → served) pairs back and apply them with
    # replace — aggregate(map) keeps the whole rewrite in one pass
    group_cols = [c for c in docs.columns]
    pairs = joined.groupBy(*group_cols).agg(
        F.collect_list(
            F.when(
                F.col("_served").isNotNull(), F.struct(F.col("_ref"), F.col("_served"))
            )
        ).alias("_repl")
    )
    rewritten = F.aggregate(
        F.col("_repl"),
        F.col(text_col),
        lambda acc, r: F.replace(acc, r["_ref"], r["_served"]),
    )
    return pairs.withColumn(text_col, rewritten).drop("_repl")


def drop_image_refs(col: Column | str) -> Column:
    """Strip all markdown image tags (the blanket form of the
    dead-ref removal; :func:`validate_image_refs` is the selective
    HEAD-validated form)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"!\[[^\]]*\]\([^)]*\)", "")


def head_image_checker(timeout_s: float = 5.0):
    """The REAL P13 checker (多数据源获取数据.py:570-598,1318-1346):
    HEAD each URL with redirects, valid iff the response succeeds AND
    its content-type contains ``image``; any transport error is
    invalid. Returns a batch callable for
    :func:`validate_image_refs` — httpx where importable, stdlib
    urllib otherwise (the loopback suite drives both shapes over real
    sockets)."""

    def check(urls):
        out = []
        for u in urls:
            ok = False
            try:
                try:
                    import httpx  # noqa: PLC0415

                    resp = httpx.head(u, timeout=timeout_s, follow_redirects=True)
                    ok = resp.is_success and "image" in (
                        resp.headers.get("content-type", "").lower()
                    )
                except ImportError:
                    from urllib.request import Request, urlopen  # noqa: PLC0415

                    req = Request(u, method="HEAD")
                    with urlopen(req, timeout=timeout_s) as r:
                        ct = (r.headers.get("Content-Type") or "").lower()
                        ok = 200 <= r.status < 300 and "image" in ct
            except Exception:  # noqa: BLE001 — dead/unreachable = invalid
                ok = False
            out.append(ok)
        return out

    return check


def _regex_quote(url: Column) -> Column:
    """Escape every regex metacharacter in a data URL so it can embed
    in a JVM-side removal pattern."""
    return F.regexp_replace(url, r"([^A-Za-z0-9_])", r"\\$1")


def validate_image_refs(
    docs: DataFrame,
    checker,
    text_col: str = "text",
    cap: int = MAX_IMAGE_REFS,
    max_refs_per_doc: int = 500,
) -> DataFrame:
    """P13, the HEAD-validation dead-ref filter, Spark-first
    (多数据源获取数据.py:570-598, 1318-1346): per document take the
    DISTINCT image URLs in reading order, network-check the first
    ``cap`` (the reference validates 25 and lets the rest default to
    VALID), and strip the markdown tags of every checked-and-invalid
    URL. Non-http(s) refs are invalid without touching the network —
    the reference's scheme guard.

    Scale shape: refs explode (narrow) → corpus-wide DISTINCT of the
    checked http URLs → the checker runs ONCE PER DISTINCT URL in an
    Arrow-batched ``mapInPandas`` stage (a URL referenced by a
    million docs costs one HEAD, not a million) → verdicts broadcast-
    join back to the per-doc refs → one per-doc fold applies the
    removals. Determinism note, stated plainly: the reference checks
    ``set(urls)[:25]`` — a NONDETERMINISTIC 25 under Python set
    ordering; this restatement pins "first 25 in reading order".

    ``checker``: ``Callable[[Sequence[str]], Sequence[bool]]`` over a
    batch of distinct URLs — :func:`head_image_checker` for the real
    network, any deterministic callable for hermetic tests/oracles
    (it is cloudpickled to executors: define test fakes inside the
    test body).

    Cardinality contract: output has EXACTLY one row per input row —
    the per-doc re-fold groups on a synthetic row key minted before
    the explode (monotonically_increasing_id), so two fully identical
    input rows stay two output rows instead of collapsing into one
    (grouping on the data columns would silently dedup)."""
    import pandas as pd  # noqa: PLC0415

    group_cols = list(docs.columns)
    docs = docs.withColumn("_row_key", F.monotonically_increasing_id())
    refs = docs.select(
        "*",
        F.posexplode_outer(
            F.slice(
                F.array_distinct(
                    F.regexp_extract_all(F.col(text_col), F.lit(_IMG_RE), 1)
                ),
                1,
                max_refs_per_doc,
            )
        ).alias("_pos", "_ref"),
    )
    is_http = F.col("_ref").startswith("http://") | F.col("_ref").startswith(
        "https://"
    )
    checked = F.col("_pos") < cap
    to_check = (
        refs.filter(checked & is_http).select(F.col("_ref").alias("_url")).distinct()
    )

    def run(batches):
        for pdf in batches:
            urls = list(pdf["_url"])
            yield pd.DataFrame({"_url": urls, "_ok": list(checker(urls))})

    verdicts = to_check.mapInPandas(run, schema="_url string, _ok boolean")
    # no broadcast hint: the verdict table is |distinct checked urls| —
    # small corpora broadcast via AQE on their own, web-scale corpora
    # need the url-keyed shuffle join
    joined = refs.join(verdicts, refs["_ref"] == verdicts["_url"], "left")
    invalid = checked & F.col("_ref").isNotNull() & (
        (~is_http) | (F.col("_ok") == F.lit(False))
    )
    folded = joined.groupBy("_row_key").agg(
        *[F.first(c).alias(c) for c in group_cols],
        F.sort_array(
            F.collect_list(F.when(invalid, F.col("_ref")))
        ).alias("_dead"),
    )
    # one fold applies every removal; the pattern embeds the escaped
    # URL and requires the tag's URL to END there (whitespace+title or
    # the closing paren), so a dead URL never swallows a longer live
    # one sharing its prefix
    removed = F.aggregate(
        F.col("_dead"),
        F.col(text_col),
        lambda acc, u: F.regexp_replace(
            acc,
            F.concat(
                F.lit(r"!\[[^\]]*\]\("),
                _regex_quote(u),
                F.lit(r"(\s[^)]*)?\)"),
            ),
            F.lit(""),
        ),
    )
    return folded.withColumn(text_col, removed).drop("_dead", "_row_key")
