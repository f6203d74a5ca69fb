"""URL canonicalization — the normalization pass a crawl-scale
training-data pipeline runs before URL-level dedup: the same resource
fetched as ``HTTPS://WWW.Example.COM:443/a?utm_source=x&b=2&a=1#top``
and ``https://www.example.com/a?a=1&b=2`` must collapse to ONE key or
every downstream exact-dedup/frequency/robots stage double-counts it.

Pure JVM column expressions (regexp + higher-order array functions) —
no UDF, runs at scan speed inside whole-stage codegen, and every rule
is replayable in ANSI-ish SQL for the DuckDB oracle
(``url_canonical_dedup_docs``).

Canonical form:
- scheme and host lowercased;
- default ports dropped (http:80, https:443), explicit others kept;
- fragment dropped;
- empty path becomes "/" (path case preserved — paths are
  case-sensitive per RFC 3986);
- query parameters: empties and tracking params (``utm_*``,
  ``gclid``, ``fbclid``, ``ref``) dropped, the rest sorted
  lexicographically and rejoined.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|ref)(=|$)"


def canonical_url(url: Column) -> Column:
    """Canonicalize one URL column (see module docstring for rules)."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    rest = F.regexp_replace(rest, r"#.*", "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    portpart = F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit(""))
    path = F.regexp_extract(rest, r"^[^/?]*(/[^?]*)?", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qraw = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(qraw, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qpart = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, portpart, path, qpart)
