"""Recorded-fixture integration replay for the connector family.

The contract tests in test_sources.py verify each connector's parse/
retry logic with ad-hoc fakes; THIS suite replays golden HTTP
exchanges (tests/fixtures/connector_replays.json) through the same
injectable-transport seam and asserts each outgoing call's arguments
EQUAL the recording — so a regression in header construction,
pagination params, or payload shape fails offline instead of only
surfacing against the live endpoints (reference wire behaviors:
fast_tuoyu_scraper.py:32-98, 多数据源获取链接.py:776-980,
多数据源获取数据.py:1498-1704). Covers all ten Http* wire paths,
pagination, retry-after-failure, and the skipped/failed envelopes.
No network, no sleeps (injected sleeper records backoff instead).
"""

from __future__ import annotations

import json
import pathlib

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

_FIXTURES = json.loads(
    (pathlib.Path(__file__).parent / "fixtures" / "connector_replays.json").read_text()
)


class ReplayTransport:
    """Replays one recorded scenario strictly in order. Every call's
    args must equal the recorded ``expect`` list; a mismatch or an
    exhausted recording raises AssertionError (the replay IS the
    assertion). ``raise`` entries inject transport faults to drive the
    retry/backoff paths."""

    def __init__(self, scenario: str):
        self.exchanges = list(_FIXTURES[scenario])
        self.scenario = scenario
        self.calls = 0

    def __call__(self, *args):
        assert self.exchanges, (
            f"{self.scenario}: connector made more calls than recorded "
            f"({self.calls} replayed)"
        )
        ex = self.exchanges.pop(0)
        self.calls += 1
        got = json.loads(json.dumps(list(args)))  # normalize tuples etc.
        assert got == ex["expect"], (
            f"{self.scenario} call {self.calls}: request drift\n"
            f"  sent:     {got}\n  recorded: {ex['expect']}"
        )
        if "raise" in ex:
            raise ConnectionError(ex["raise"])
        resp = ex["respond"]
        return tuple(resp) if isinstance(resp, list) else resp

    def assert_drained(self):
        assert not self.exchanges, (
            f"{self.scenario}: {len(self.exchanges)} recorded exchanges never replayed"
        )


class _Sleeper:
    def __init__(self):
        self.naps: list[float] = []

    def __call__(self, s: float):
        self.naps.append(s)


def test_replay_searchapi_search():
    t = ReplayTransport("searchapi_search")
    p = HttpSearchApiProvider(api_key="K-SEARCHAPI", transport=t, sleeper=_Sleeper())
    rows = p("托育 政策", n=3)
    t.assert_drained()
    # link-less item dropped; provider-prefixed keys; query attached
    assert [r["searchapi_url"] for r in rows] == [
        "https://example.cn/a",
        "https://example.cn/b",
    ]
    assert all(r["query"] == "托育 政策" for r in rows)
    assert rows[0]["searchapi_snippet"] == "最新托育政策"


def test_replay_jina_search_caps_then_drops():
    t = ReplayTransport("jina_search")
    p = HttpJinaSearchProvider(api_key="K-JINA", transport=t, sleeper=_Sleeper())
    rows = p("托育 政策", n=3)
    t.assert_drained()
    # reference semantics: cap FIRST (3 of 4), then drop no-url → 2 rows
    assert [r["jina_url"] for r in rows] == [
        "https://example.cn/a",
        "https://example.cn/b",
    ]


def test_replay_firecrawl_search():
    t = ReplayTransport("firecrawl_search")
    p = HttpFirecrawlSearchProvider(api_key="K-FC", transport=t, sleeper=_Sleeper())
    rows = p("托育 政策", n=2)
    t.assert_drained()
    assert [r["firecrawl_markdown"] for r in rows] == ["# A", "# B"]


def test_replay_tavily_search():
    t = ReplayTransport("tavily_search")
    p = HttpTavilySearchProvider(api_key="K-TVL", transport=t, sleeper=_Sleeper())
    rows = p("托育 政策", n=2)
    t.assert_drained()
    assert [r["tavily_score"] for r in rows] == [0.91, 0.55]


def test_replay_firecrawl_scrape_retry_then_success():
    t = ReplayTransport("firecrawl_scrape_retry_then_success")
    naps = _Sleeper()
    s = HttpFirecrawlScraper(
        api_key="K-FIRECRAWL", backoff_s=1.0, transport=t, sleeper=naps
    )
    out = s({"origin_key": "k1", "url": "https://example.cn/page"})
    t.assert_drained()
    # first attempt faulted → one backoff nap at backoff_s * 2^0
    assert naps.naps == [1.0]
    assert out["status"] == "success"
    assert out["content"] == "# 页面正文"
    # final URL rewritten from metadata.sourceURL
    assert out["url"] == "https://example.cn/page?canonical=1"
    assert out["origin_key"] == "k1"


def test_replay_jina_reader_both_shapes():
    t = ReplayTransport("jina_reader_json_envelope")
    s = HttpJinaReaderScraper(api_key="K-JINA", transport=t, sleeper=_Sleeper())
    out = s({"origin_key": "k1", "url": "https://example.cn/page"})
    t.assert_drained()
    assert out["status"] == "success" and out["content"] == "# 页面正文"
    assert out["url"] == "https://example.cn/page/final"

    t2 = ReplayTransport("jina_reader_raw_markdown")
    out2 = HttpJinaReaderScraper(api_key="K-JINA", transport=t2, sleeper=_Sleeper())(
        {"origin_key": "k2", "url": "https://example.cn/raw"}
    )
    t2.assert_drained()
    assert out2["status"] == "success" and out2["content"] == "# 原始 markdown 正文"
    assert out2["url"] == "https://example.cn/raw"  # raw shape keeps the input url


def test_replay_tavily_extract_success_and_exhausted_retries():
    t = ReplayTransport("tavily_extract_success")
    s = HttpTavilyScraper(api_key="K-TAVILY", transport=t, sleeper=_Sleeper())
    out = s({"origin_key": "k1", "url": "https://example.cn/doc"})
    t.assert_drained()
    assert out["status"] == "success" and out["content"] == "# 提取正文"
    assert out["url"] == "https://example.cn/doc/final"

    # empty results every attempt → failed row after max_retries=2
    t2 = ReplayTransport("tavily_extract_fail_all_retries")
    naps = _Sleeper()
    s2 = HttpTavilyScraper(
        api_key="K-TAVILY", max_retries=2, backoff_s=0.5, transport=t2, sleeper=naps
    )
    out2 = s2({"origin_key": "k2", "url": "https://example.cn/gone"})
    t2.assert_drained()
    assert out2["status"] == "failed" and out2["content"] == ""
    assert "404" in out2["error_message"]
    assert naps.naps == [0.5]  # one nap between the two attempts


def test_replay_zhilian_envelopes():
    t = ReplayTransport("zhilian_success")
    src = HttpZhiLianJobSource(
        api_url="https://jobs.internal.example/api/scrape",
        transport=t,
        sleeper=_Sleeper(),
    )
    ok = src({"keywords": "保育员", "provinces": "四川", "page_size": "20"})
    t.assert_drained()  # page_size string coerced to int in the payload
    assert ok["status"] == "success" and ok["data"][0]["city"] == "成都"

    # invalid payload short-circuits to skipped WITHOUT touching the wire
    untouched = ReplayTransport("zhilian_success")
    src2 = HttpZhiLianJobSource(
        api_url="https://jobs.internal.example/api/scrape",
        transport=untouched,
        sleeper=_Sleeper(),
    )
    skipped = src2({"keywords": "保育员"})  # no provinces
    assert skipped["status"] == "skipped" and untouched.calls == 0

    # non-200 API code → failed envelope (no retry: it's a server answer)
    t3 = ReplayTransport("zhilian_error_code")
    src3 = HttpZhiLianJobSource(
        api_url="https://jobs.internal.example/api/scrape",
        max_retries=1,
        transport=t3,
        sleeper=_Sleeper(),
    )
    failed = src3({"keywords": "保育员", "provinces": "四川", "page_size": 20})
    t3.assert_drained()
    assert failed["status"] == "failed" and "429" in failed["message"]


def test_replay_tianyancha_envelopes():
    t = ReplayTransport("tianyancha_success")
    lk = HttpTianyanEnterpriseLookup(token="TOKEN-TYC", transport=t, sleeper=_Sleeper())
    ok = lk("成都天使托育园")
    t.assert_drained()
    assert ok["status"] == "success"
    assert ok["data"]["creditCode"] == "915100000000000001"
    assert ok["query_name"] == "成都天使托育园"

    # empty name → skipped without touching the wire
    untouched = ReplayTransport("tianyancha_success")
    lk2 = HttpTianyanEnterpriseLookup(
        token="TOKEN-TYC", transport=untouched, sleeper=_Sleeper()
    )
    assert lk2("")["status"] == "skipped" and untouched.calls == 0

    # non-zero error_code → failed, join key preserved
    t3 = ReplayTransport("tianyancha_error_code")
    lk3 = HttpTianyanEnterpriseLookup(
        token="TOKEN-TYC", max_retries=1, transport=t3, sleeper=_Sleeper()
    )
    failed = lk3("不存在的公司")
    t3.assert_drained()
    assert failed["status"] == "failed" and failed["query_name"] == "不存在的公司"
    assert "300000" in failed["message"]


def test_replay_tuoyu_registry_pagination_with_transient_fault():
    t = ReplayTransport("tuoyu_registry_paginated")
    naps = _Sleeper()
    src = HttpTuoyuRegistrySource(
        base_url="https://registry.example.gov/api/list",
        backoff_s=0.5,
        transport=t,
        sleeper=naps,
    )
    out = src.scrape_all(page_size=2, keyword="成都")
    t.assert_drained()
    # page-1 discovery → totalPage=3 → pages 2..3 fetched in order;
    # page 3's transient fault retried (one 0.5s backoff) then succeeded
    assert out["total_page"] == 3 and out["total_record"] == 6
    assert [r["id"] for r in out["records"]] == [1, 2, 3, 4, 5, 6]
    assert out["errors"] == []
    assert naps.naps == [0.5]


def test_replay_tuoyu_registry_api_error_recorded_not_raised():
    t = ReplayTransport("tuoyu_registry_page_error_envelope")
    src = HttpTuoyuRegistrySource(
        base_url="https://registry.example.gov/api/list",
        max_retries=1,
        transport=t,
        sleeper=_Sleeper(),
    )
    out = src.scrape_all(page_size=2)
    t.assert_drained()
    # non-000000 page-2 envelope lands in errors; crawl result survives
    assert [r["id"] for r in out["records"]] == [1]
    assert len(out["errors"]) == 1 and "invalid key" in out["errors"][0]


def test_replay_transport_catches_request_drift():
    """The harness itself: a connector sending different params than
    recorded must fail the replay (this is the live-regression guard)."""
    t = ReplayTransport("searchapi_search")
    p = HttpSearchApiProvider(
        api_key="K-SEARCHAPI", engine="bing", max_retries=1,
        transport=t, sleeper=_Sleeper(),
    )
    rows = p("托育 政策", n=3)  # engine drift → AssertionError per attempt
    # the connector's retry wrapper converts it to the error row — the
    # drift is still surfaced as a failed replay, never a silent pass
    assert "searchapi_error" in rows[0]
    assert "request drift" in rows[0]["searchapi_error"]
