"""Loopback-HTTP integration tier for the connector family (round-6
verdict #6): a stdlib ``http.server`` fixture runs in-process and the
ten Http* wire paths are driven over REAL sockets with their DEFAULT
transports (``transport=None`` → httpx when importable, stdlib urllib
otherwise — in this container the urllib path). The replay suite
(test_connectors_replay.py) pins request CONSTRUCTION at the
injectable-transport seam; THIS suite checks the transport itself:
URL/query encoding, JSON body framing, header emission, status-code
error handling (HTTP 500 → retry with backoff → success), and
content-type dispatch — hermetically, no network, no keys, no sleeps
(reference wire behaviors: fast_tuoyu_scraper.py:32-98,
多数据源获取链接.py:776-980, 多数据源获取数据.py:1498-1704).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from data_pipeline_childcare_spark.sources.connectors import (
    HttpFirecrawlScraper,
    HttpFirecrawlSearchProvider,
    HttpJinaReaderScraper,
    HttpJinaSearchProvider,
    HttpSearchApiProvider,
    HttpTavilyScraper,
    HttpTavilySearchProvider,
    HttpTianyanEnterpriseLookup,
    HttpTuoyuRegistrySource,
    HttpZhiLianJobSource,
)


class _Recorded:
    def __init__(self, method, path, query, headers, body):
        self.method = method
        self.path = path
        self.query = query  # dict[str, list[str]]
        self.headers = headers  # dict (lower-cased keys)
        self.body = body  # bytes

    @property
    def json(self):
        return json.loads(self.body.decode("utf-8"))


class _Loopback:
    """Scripted one-shot HTTP server on 127.0.0.1:ephemeral.

    ``script`` is a list of (status, content_type, body_str); each
    request pops the next entry (an exhausted script answers 599 so a
    connector making surplus calls fails loudly). Every request is
    recorded for post-hoc assertions."""

    def __init__(self, script):
        self.script = list(script)
        self.requests: list[_Recorded] = []
        outer = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def _serve(self, method):
                n = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(n) if n else b""
                parsed = urlparse(self.path)
                outer.requests.append(
                    _Recorded(
                        method,
                        parsed.path,
                        parse_qs(parsed.query),
                        {k.lower(): v for k, v in self.headers.items()},
                        body,
                    )
                )
                if outer.script:
                    status, ctype, payload = outer.script.pop(0)
                else:
                    status, ctype, payload = 599, "text/plain", "script exhausted"
                data = payload.encode("utf-8")
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                self._serve("GET")

            def do_POST(self):
                self._serve("POST")

            def do_HEAD(self):
                # same scripted flow, body suppressed per RFC
                n = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(n) if n else b""
                parsed = urlparse(self.path)
                outer.requests.append(
                    _Recorded(
                        "HEAD",
                        parsed.path,
                        parse_qs(parsed.query),
                        {k.lower(): v for k, v in self.headers.items()},
                        body,
                    )
                )
                if outer.script:
                    status, ctype, payload = outer.script.pop(0)
                else:
                    status, ctype, payload = 599, "text/plain", "script exhausted"
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(payload.encode("utf-8"))))
                self.end_headers()

            def log_message(self, *args):  # silence stderr
                pass

        self._srv = HTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self._srv.server_port}"
        self._thread = threading.Thread(target=self._srv.serve_forever, daemon=True)
        self._thread.start()

    def close(self):
        self._srv.shutdown()
        self._srv.server_close()
        self._thread.join(timeout=5)


@pytest.fixture
def loopback():
    servers = []

    def make(script):
        s = _Loopback(script)
        servers.append(s)
        return s

    yield make
    for s in servers:
        s.close()


def _j(obj) -> tuple[int, str, str]:
    return (200, "application/json", json.dumps(obj))


class _Sleeper:
    def __init__(self):
        self.naps: list[float] = []

    def __call__(self, s: float):
        self.naps.append(s)


def test_loopback_searchapi_get_query_encoding(loopback):
    srv = loopback(
        [
            _j(
                {
                    "organic_results": [
                        {"title": "托育政策解读", "link": "https://example.cn/a",
                         "source": "example", "snippet": "最新托育政策"},
                        {"title": "无链接条目"},
                    ]
                }
            )
        ]
    )
    p = HttpSearchApiProvider(
        api_key="K-SEARCHAPI", base_url=f"{srv.url}/api/v1/search", sleeper=_Sleeper()
    )
    rows = p("托育 政策", n=3)
    assert [r["searchapi_url"] for r in rows] == ["https://example.cn/a"]
    (req,) = srv.requests
    assert req.method == "GET" and req.path == "/api/v1/search"
    # urlencode round-trips the CJK query and every param
    assert req.query["q"] == ["托育 政策"]
    assert req.query["engine"] == ["google"]
    assert req.query["num"] == ["3"]
    assert req.query["api_key"] == ["K-SEARCHAPI"]


def test_loopback_jina_search_post_headers_and_body(loopback):
    srv = loopback(
        [
            _j(
                {
                    "data": [
                        {"url": "https://example.cn/a", "title": "A", "description": "da"},
                        {"title": "no url"},
                        {"url": "https://example.cn/b", "title": "B", "description": "db"},
                    ]
                }
            )
        ]
    )
    p = HttpJinaSearchProvider(
        api_key="K-JINA", base_url=f"{srv.url}/", sleeper=_Sleeper()
    )
    rows = p("托育 政策", n=3)
    assert [r["jina_url"] for r in rows] == [
        "https://example.cn/a",
        "https://example.cn/b",
    ]
    (req,) = srv.requests
    assert req.method == "POST"
    assert req.headers["authorization"] == "Bearer K-JINA"
    assert req.headers["x-respond-with"] == "no-content"
    assert req.headers["content-type"] == "application/json"
    assert req.json == {"q": "托育 政策", "gl": "CN", "hl": "zh-cn"}


def test_loopback_firecrawl_search(loopback):
    srv = loopback(
        [
            _j(
                {
                    "success": True,
                    "data": {
                        "web": [
                            {"url": "https://example.cn/a", "title": "A",
                             "description": "da", "markdown": "# A"},
                            {"url": "https://example.cn/b", "title": "B",
                             "description": "db", "markdown": "# B"},
                        ]
                    },
                }
            )
        ]
    )
    p = HttpFirecrawlSearchProvider(
        api_key="K-FC", base_url=f"{srv.url}/v2/search", sleeper=_Sleeper()
    )
    rows = p("托育 政策", n=2)
    assert [r["firecrawl_markdown"] for r in rows] == ["# A", "# B"]
    (req,) = srv.requests
    assert req.headers["authorization"] == "Bearer K-FC"
    assert req.json["query"] == "托育 政策" and req.json["limit"] == 2


def test_loopback_tavily_search(loopback):
    srv = loopback(
        [
            _j(
                {
                    "results": [
                        {"url": "https://example.cn/a", "title": "A",
                         "content": "ca", "score": 0.91},
                        {"url": "https://example.cn/b", "title": "B",
                         "content": "cb", "score": 0.55},
                    ]
                }
            )
        ]
    )
    p = HttpTavilySearchProvider(
        api_key="K-TVL", base_url=f"{srv.url}/search", sleeper=_Sleeper()
    )
    rows = p("托育 政策", n=2)
    assert [r["tavily_score"] for r in rows] == [0.91, 0.55]
    (req,) = srv.requests
    assert req.headers["authorization"] == "Bearer K-TVL"
    assert req.json["query"] == "托育 政策"


def test_loopback_firecrawl_scrape_http500_retry_then_success(loopback):
    srv = loopback(
        [
            (500, "application/json", json.dumps({"error": "transient"})),
            _j(
                {
                    "success": True,
                    "data": {
                        "markdown": "# 页面正文",
                        "metadata": {"sourceURL": "https://example.cn/page?canonical=1"},
                    },
                }
            ),
        ]
    )
    naps = _Sleeper()
    s = HttpFirecrawlScraper(
        api_key="K-FIRECRAWL",
        base_url=f"{srv.url}/v2/scrape",
        backoff_s=1.0,
        sleeper=naps,
    )
    out = s({"origin_key": "k1", "url": "https://example.cn/page"})
    # the REAL transport raised on HTTP 500 (urllib HTTPError /
    # httpx raise_for_status), the retry driver backed off once, the
    # second socket round-trip succeeded
    assert naps.naps == [1.0]
    assert out["status"] == "success" and out["content"] == "# 页面正文"
    assert out["url"] == "https://example.cn/page?canonical=1"
    assert len(srv.requests) == 2
    assert srv.requests[0].json == srv.requests[1].json  # identical re-send


def test_loopback_jina_reader_content_type_dispatch(loopback):
    # JSON envelope shape: Content-Type steers the parse
    srv = loopback(
        [
            _j(
                {
                    "code": 200,
                    "data": {"content": "# 页面正文", "url": "https://example.cn/page/final"},
                }
            )
        ]
    )
    s = HttpJinaReaderScraper(
        api_key="K-JINA", base_url=f"{srv.url}/", sleeper=_Sleeper()
    )
    out = s({"origin_key": "k1", "url": "https://example.cn/page"})
    assert out["status"] == "success" and out["content"] == "# 页面正文"
    assert out["url"] == "https://example.cn/page/final"
    (req,) = srv.requests
    # reader prepends base_url to the target: path carries the target URL
    assert req.path == "/https://example.cn/page"
    assert req.headers["x-return-format"] == "markdown"
    assert req.headers["authorization"] == "Bearer K-JINA"

    # raw markdown shape: non-JSON content type passes the body through
    srv2 = loopback([(200, "text/markdown; charset=utf-8", "# 原始 markdown 正文")])
    out2 = HttpJinaReaderScraper(
        api_key="K-JINA", base_url=f"{srv2.url}/", sleeper=_Sleeper()
    )({"origin_key": "k2", "url": "https://example.cn/raw"})
    assert out2["status"] == "success" and out2["content"] == "# 原始 markdown 正文"
    assert out2["url"] == "https://example.cn/raw"


def test_loopback_tavily_extract_success_and_exhausted_retries(loopback):
    srv = loopback(
        [
            _j(
                {
                    "results": [
                        {"url": "https://example.cn/doc/final", "raw_content": "# 提取正文"}
                    ]
                }
            )
        ]
    )
    s = HttpTavilyScraper(
        api_key="K-TAVILY", base_url=f"{srv.url}/extract", sleeper=_Sleeper()
    )
    out = s({"origin_key": "k1", "url": "https://example.cn/doc"})
    assert out["status"] == "success" and out["url"] == "https://example.cn/doc/final"
    (req,) = srv.requests
    assert req.json == {"urls": ["https://example.cn/doc"], "format": "markdown"}

    # two REAL 404s exhaust max_retries=2 → failed row, one backoff nap
    srv2 = loopback(
        [
            (404, "application/json", json.dumps({"failed_results": ["gone"]})),
            (404, "application/json", json.dumps({"failed_results": ["gone"]})),
        ]
    )
    naps = _Sleeper()
    out2 = HttpTavilyScraper(
        api_key="K-TAVILY",
        base_url=f"{srv2.url}/extract",
        max_retries=2,
        backoff_s=0.5,
        sleeper=naps,
    )({"origin_key": "k2", "url": "https://example.cn/gone"})
    assert out2["status"] == "failed" and out2["content"] == ""
    assert "404" in out2["error_message"]
    assert naps.naps == [0.5]
    assert len(srv2.requests) == 2


def test_loopback_zhilian_envelopes(loopback):
    srv = loopback(
        [_j({"code": 200, "data": [{"city": "成都", "title": "保育员"}], "message": "ok"})]
    )
    src = HttpZhiLianJobSource(api_url=f"{srv.url}/api/scrape", sleeper=_Sleeper())
    ok = src({"keywords": "保育员", "provinces": "四川", "page_size": "20"})
    assert ok["status"] == "success" and ok["data"][0]["city"] == "成都"
    (req,) = srv.requests
    assert req.json["page_size"] == 20  # string coerced before the wire
    assert req.headers["content-type"] == "application/json"

    # non-200 API code: a deterministic server answer — exactly ONE
    # socket round-trip, failed envelope, no retry burn
    srv2 = loopback([_j({"code": 429, "message": "限流"})])
    failed = HttpZhiLianJobSource(
        api_url=f"{srv2.url}/api/scrape", max_retries=3, sleeper=_Sleeper()
    )({"keywords": "保育员", "provinces": "四川", "page_size": 20})
    assert failed["status"] == "failed" and "429" in failed["message"]
    assert len(srv2.requests) == 1


def test_loopback_tianyancha_get_with_auth_header(loopback):
    srv = loopback(
        [
            _j(
                {
                    "error_code": 0,
                    "reason": "ok",
                    "result": {"creditCode": "915100000000000001", "name": "成都天使托育园"},
                }
            )
        ]
    )
    lk = HttpTianyanEnterpriseLookup(
        token="TOKEN-TYC", api_url=f"{srv.url}/services/open/ic/baseinfo/normal",
        sleeper=_Sleeper(),
    )
    ok = lk("成都天使托育园")
    assert ok["status"] == "success"
    assert ok["data"]["creditCode"] == "915100000000000001"
    (req,) = srv.requests
    assert req.method == "GET"
    assert req.headers["authorization"] == "TOKEN-TYC"  # raw token, not Bearer
    assert req.query["keyword"] == ["成都天使托育园"]


def test_loopback_tuoyu_pagination_with_real_500_retry(loopback):
    def page(ids, total=6, pages=3):
        return _j(
            {
                "code": "000000",
                "responseData": {
                    "totalRecord": total,
                    "totalPage": pages,
                    "dataList": [{"id": i, "name": f"机构{i}"} for i in ids],
                },
            }
        )

    srv = loopback(
        [
            page([1, 2]),
            page([3, 4]),
            (500, "text/plain", "boom"),  # transient fault on page 3
            page([5, 6]),
        ]
    )
    naps = _Sleeper()
    src = HttpTuoyuRegistrySource(
        base_url=f"{srv.url}/api/list", backoff_s=0.5, sleeper=naps
    )
    out = src.scrape_all(page_size=2, keyword="成都")
    assert out["total_page"] == 3 and out["total_record"] == 6
    assert [r["id"] for r in out["records"]] == [1, 2, 3, 4, 5, 6]
    assert out["errors"] == [] and naps.naps == [0.5]
    # four socket round-trips: pages 1, 2, 3(500), 3(retry)
    assert len(srv.requests) == 4
    assert [r.query["pageNum"] for r in srv.requests] == [["1"], ["2"], ["3"], ["3"]]
    assert all(r.query["key"] == ["成都"] for r in srv.requests)


def test_loopback_tuoyu_api_error_envelope_raises_without_retry(loopback):
    srv = loopback([_j({"code": "999999", "message": "无效密钥"})])
    src = HttpTuoyuRegistrySource(base_url=f"{srv.url}/api/list", sleeper=_Sleeper())
    with pytest.raises(RuntimeError, match="无效密钥"):
        src.fetch_page(1, 2, "成都")
    assert len(srv.requests) == 1  # deterministic answer: no retry


def test_loopback_head_image_checker(loopback):
    """P13's real prober over real sockets: HEAD only (no body read),
    image/* content-type required, error statuses and transport
    failures invalid (reference 多数据源获取数据.py:570-598)."""
    from data_pipeline_childcare_spark.functions.markdown import head_image_checker

    srv = loopback(
        [
            (200, "image/png", ""),
            (200, "text/html; charset=utf-8", ""),
            (404, "image/png", ""),
        ]
    )
    check = head_image_checker(timeout_s=5)
    got = check(
        [
            f"{srv.url}/img/ok.png",
            f"{srv.url}/page.html",
            f"{srv.url}/gone.png",
            "http://127.0.0.1:1/unreachable.png",  # refused port → invalid
        ]
    )
    assert got == [True, False, False, False]
    assert [r.method for r in srv.requests] == ["HEAD", "HEAD", "HEAD"]
    assert srv.requests[0].path == "/img/ok.png"
