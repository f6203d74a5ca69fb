"""Sources layer: record-block corpus, document parsing, multimodal,
JSON repair."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_pipeline_childcare_spark.functions.udfs import extract_json, parse_json_column
from data_pipeline_childcare_spark.sources.documents import (
    decode_bytes,
    parse_documents,
    sniff_format,
)
from data_pipeline_childcare_spark.sources.multimodal import (
    attach_media_metadata,
    image_features,
    sample_frames,
)
from data_pipeline_childcare_spark.sources.record_blocks import (
    institution_records,
    moe_records,
    parse_blocks,
    read_record_blocks,
)

CORPUS = (
    "机构名称：成都天使托育园\n统一社会信用代码：915101\n机构类型：营利性\n"
    "详细地址：四川省成都市\n备案及完成时间：2021-05-10 12:00:00\n区域编号：510100000000"
    "^_^"
    "机构名称：四川幼专\n省份：四川\n学校标识码：4151012345\n"
    "开设专业：婴幼儿托育服务与管理 (520802)\n修业年限：三年\n年份：2021\n备注：无"
    "^_^"
)


def test_record_block_corpus_roundtrip(spark, tmp_path):
    p = tmp_path / "corpus.txt"
    p.write_text(CORPUS, encoding="utf-8")
    blocks = read_record_blocks(spark, str(p))
    assert blocks.count() == 2
    parsed = parse_blocks(blocks)
    types = {r["record_type"] for r in parsed.collect()}
    assert types == {"institution", "moe"}

    inst = institution_records(parsed).first()
    assert inst["name"] == "成都天使托育园"
    assert inst["registered_at"].year == 2021
    assert inst["region_code"] == "510100000000"

    moe = moe_records(parsed).first()
    assert moe["major_name"] == "婴幼儿托育服务与管理"
    assert moe["major_code"] == "520802"
    assert moe["year"] == 2021


def test_encoding_fallback_chain():
    assert decode_bytes("中文".encode("gbk")) == "中文"
    assert decode_bytes("中文".encode("utf-8")) == "中文"
    assert decode_bytes(b"plain ascii") == "plain ascii"


def test_document_parse_dispatch(spark, tmp_path):
    (tmp_path / "a.txt").write_text("hello text", encoding="utf-8")
    (tmp_path / "b.json").write_text('{"k": [1, 2]}', encoding="utf-8")
    (tmp_path / "c.csv").write_text("x,y\n1,2\n3,4\n", encoding="utf-8")
    (tmp_path / "d.html").write_text(
        "<html><script>evil()</script><body><p>Body text</p></body></html>", encoding="utf-8"
    )
    (tmp_path / "e.pdf").write_bytes(b"%PDF-1.4 fake content")

    from data_pipeline_childcare_spark.sources.documents import read_documents

    docs = read_documents(spark, str(tmp_path))
    parsed = {r["fmt"]: r for r in parse_documents(docs).collect()}
    assert parsed["txt"]["content"] == "hello text"
    assert '"k"' in parsed["json"]["content"] and parsed["json"]["content"].startswith("```json")
    assert "| x | y |" in parsed["csv"]["content"]
    assert "Body text" in parsed["html"]["content"] and "evil" not in parsed["html"]["content"]
    # pdf lib absent in container → clearly marked stub, no error
    assert parsed["pdf"]["error"] is None and "STUB:pdf" in parsed["pdf"]["content"]


def test_sniff_format_magic_bytes(spark):
    df = spark.createDataFrame(
        [("noext_pdf", bytearray(b"%PDF rest")), ("noext_zip", bytearray(b"PK\x03\x04zz"))],
        "path string, content binary",
    )
    got = {r["path"]: r["fmt"] for r in df.select("path", sniff_format(F.col("path"), F.col("content")).alias("fmt")).collect()}
    assert got == {"noext_pdf": "pdf", "noext_zip": "xlsx"}


def test_extract_json_repair_paths():
    assert extract_json('{"a": 1}') == {"a": 1}
    # markdown fence
    assert extract_json('noise ```json\n{"a": 1}\n``` trailing') == {"a": 1}
    # trailing comma + python literals
    assert extract_json('{"a": [1, 2,], "b": True, "c": None}') == {"a": [1, 2], "b": True, "c": None}
    # double-escaped payload
    assert extract_json('{\\"a\\": 1}') == {"a": 1}
    # picks the LARGEST candidate
    assert extract_json('{"x":1} and {"a":1,"b":[1,2,3]}') == {"a": 1, "b": [1, 2, 3]}
    # unparseable → None
    assert extract_json("no json here") is None
    assert extract_json(None) is None


def test_parse_json_column(spark):
    df = spark.createDataFrame(
        [('```json\n{"title": "t1", "confirm": 1}\n```',), ("garbage",)],
        "raw string",
    )
    out = df.select(
        parse_json_column(F.col("raw"), "title string, confirm int").alias("p")
    ).collect()
    assert out[0]["p"]["title"] == "t1" and out[0]["p"]["confirm"] == 1
    assert out[1]["p"] is None


def test_multimodal_metadata_and_features(spark):
    df = spark.createDataFrame(
        [
            ("a.png", bytearray(b"\x89PNG\r\n" + b"x" * 300)),
            ("b.jpg", bytearray(b"\xff\xd8\xff\xe0" + b"y" * 300)),
            ("c.wav", bytearray(b"RIFFxxxx" + b"z" * 300)),
        ],
        "path string, content binary",
    )
    meta = {r["path"]: (r["media_type"], r["mime"]) for r in attach_media_metadata(df).collect()}
    assert meta["a.png"] == ("image", "image/png")
    assert meta["b.jpg"] == ("image", "image/jpeg")
    assert meta["c.wav"] == ("audio", "audio/wav")

    feats = image_features(df.filter(F.col("path").startswith("a"))).collect()
    assert len(feats) == 1
    f0 = feats[0]
    assert f0["is_stub"] and len(f0["feature"]) == 8 and 64 <= f0["width"] < 256
    # determinism: same bytes → same fake decode
    again = image_features(df.filter(F.col("path").startswith("a"))).first()
    assert again["feature"] == f0["feature"]


def test_frame_sampling_shape(spark):
    df = spark.createDataFrame([("v.bin", bytearray(bytes(range(256))))], "path string, content binary")
    rows = sample_frames(df, every_ms=500, max_frames=3).collect()
    assert [r["frame_idx"] for r in rows] == [0, 1, 2]
    assert [r["frame_ms"] for r in rows] == [0, 500, 1000]
    assert all(len(r["frame"]) == 64 for r in rows)


def test_http_provider_contract_parses_wire_shape(spark):
    """HttpSearchApiProvider with an injected transport must be a
    drop-in for FakeSearchProvider: same prefixed dicts, same
    normalized DataFrame schema."""
    from data_pipeline_childcare_spark.sources.connectors import (
        HttpSearchApiProvider,
        run_search_tasks,
    )

    def transport(url, params):
        assert params["q"] == "托育"
        assert params["engine"] == "google" and "api_key" in params
        return {
            "organic_results": [
                {"link": "https://a.example/1", "title": "t1", "source": "s1", "snippet": "n1"},
                {"title": "no-link dropped"},
                {"link": "https://a.example/2", "title": "t2", "source": "s2", "snippet": "n2"},
            ]
        }

    p = HttpSearchApiProvider(api_key="k", transport=transport)
    raws = p("托育", 5)
    assert [r["searchapi_url"] for r in raws] == ["https://a.example/1", "https://a.example/2"]
    df = run_search_tasks(spark, [("托育", "searchapi", "ok1")], {"searchapi": p})
    rows = df.collect()
    assert {r["provider"] for r in rows} == {"searchapi"}
    assert {r["url"] for r in rows} == {"https://a.example/1", "https://a.example/2"}


def test_http_provider_retry_backoff_and_error_row():
    from data_pipeline_childcare_spark.sources.connectors import HttpSearchApiProvider

    calls, sleeps = [], []

    def flaky(url, params):
        calls.append(1)
        if len(calls) < 3:
            raise OSError("boom")
        return {"organic_results": [{"link": "https://ok.example"}]}

    p = HttpSearchApiProvider(api_key="k", transport=flaky, sleeper=sleeps.append)
    out = p("q", 1)
    assert len(calls) == 3 and [r.get("searchapi_url") for r in out] == ["https://ok.example"]
    assert sleeps == [1.0, 2.0]  # exponential backoff between attempts

    def dead(url, params):
        raise OSError("always down")

    p2 = HttpSearchApiProvider(api_key="k", transport=dead, sleeper=lambda s: None)
    out2 = p2("q", 1)
    assert len(out2) == 1 and "searchapi_error" in out2[0]


def test_datasource_nodes_feed_chunking_pipeline(spark):
    """The four Dify datasource-node variants land in one fixed-schema
    frame that the parent-child chunker consumes directly."""
    from data_pipeline_childcare_spark.operators.chunking import parent_child_chunk
    from data_pipeline_childcare_spark.sources.connectors import (
        DATASOURCE_NODES,
        run_datasource_nodes,
    )

    tasks = [("托育调研", n) for n in DATASOURCE_NODES]
    df = run_datasource_nodes(spark, tasks)
    rows = df.collect()
    assert {r["provider"] for r in rows} == set(DATASOURCE_NODES)
    assert {r["provider_type"] for r in rows} == {"online_document", "online_drive", "website_crawl"}
    assert all(r["content"] and r["url"] for r in rows)
    # determinism
    again = run_datasource_nodes(spark, tasks).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # chunker consumes it
    docs = df.selectExpr("url AS doc_id", "content AS text")
    chunks = parent_child_chunk(docs)
    assert chunks.count() >= df.count()


def test_multimodal_header_dims_column_expressions(spark):
    """Valid PNG/GIF headers yield true width/height from PURE column
    expressions (no Python), and image_features falls back to
    header-parsed dims (NODECODE tier) when PIL is absent."""
    import struct

    png = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(">II", 640, 480)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 10
    df = spark.createDataFrame(
        [("p.png", bytearray(png)), ("g.gif", bytearray(gif))], "path string, content binary"
    )
    meta = {r["path"]: r for r in attach_media_metadata(df).collect()}
    assert (meta["p.png"]["width"], meta["p.png"]["height"]) == (640, 480)
    assert (meta["g.gif"]["width"], meta["g.gif"]["height"]) == (320, 200)
    assert meta["g.gif"]["mime"] == "image/gif"

    feats = {r["path"]: r for r in image_features(df).collect()}
    try:
        import PIL  # noqa: F401

        assert not feats["p.png"]["is_stub"]  # real decode tier
    except ImportError:
        assert feats["p.png"]["mode"] == "NODECODE"
        assert (feats["p.png"]["width"], feats["p.png"]["height"]) == (640, 480)


def test_multimodal_wav_rate_and_duration(spark):
    import struct

    # canonical 44-byte PCM WAV header: 16kHz mono 16-bit, 1s of data
    sr, ch, bits = 16000, 1, 16
    byte_rate = sr * ch * bits // 8
    data_len = byte_rate  # exactly 1000 ms
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + data_len) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sr, byte_rate, ch * bits // 8, bits)
        + b"data" + struct.pack("<I", data_len)
    )
    df = spark.createDataFrame(
        [("t.wav", bytearray(hdr + b"\x00" * 64))], "path string, content binary"
    )
    r = attach_media_metadata(df).first()
    assert (r["mime"], r["sample_rate"], r["duration_ms"]) == ("audio/wav", 16000, 1000)


def _make_wav(rate, channels, samples):
    """16-bit PCM WAV from a list of per-channel sample tuples."""
    import struct as _struct

    pcm = b"".join(
        _struct.pack("<" + "h" * channels, *frame) for frame in samples
    )
    block = channels * 2
    fmt = _struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, 16)
    body = (
        b"WAVE"
        + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"data" + _struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + _struct.pack("<I", len(body)) + body


def test_audio_features_real_pcm_tier(spark):
    """A full-scale square wave has RMS = peak = 1 and a zero
    crossing at every sample boundary — exact expectations for the
    real PCM path."""
    from data_pipeline_childcare_spark.sources.multimodal import audio_features

    rate = 8000
    samples = [((32767 if i % 2 == 0 else -32768),) for i in range(800)]
    wav = _make_wav(rate, 1, samples)
    df = spark.createDataFrame([("a.wav", wav)], "path string, content binary")
    row = audio_features(df).collect()[0]
    assert row["is_stub"] is False
    assert (row["sample_rate"], row["channels"], row["n_samples"]) == (rate, 1, 800)
    assert row["duration_ms"] == 100
    assert abs(row["rms"] - 1.0) < 1e-4 and abs(row["peak"] - 1.0) < 1e-4
    assert abs(row["zcr"] - 1.0) < 1e-3


def _ima_encode(samples, rate, channels=1, samples_per_block=505):
    """Independent test-side IMA/DVI ADPCM WAV encoder (mono): the
    standard nibble quantizer with decoder-mirrored state so the
    production decoder is exercised by a stream it did not write."""
    import struct as _struct

    from data_pipeline_childcare_spark.sources.multimodal import (
        _IMA_INDEX_ADJ,
        _IMA_STEPS,
    )

    assert channels == 1
    blocks = []
    i = 0
    idx = 0
    while i < len(samples):
        chunk = samples[i : i + samples_per_block]
        i += samples_per_block
        pred = chunk[0]
        header = _struct.pack("<hBB", pred, idx, 0)
        nibbles = []
        for s in chunk[1:]:
            step = _IMA_STEPS[idx]
            diff = s - pred
            nib = 0
            if diff < 0:
                nib = 8
                diff = -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            # reconstruct exactly like the decoder so state stays in sync
            d = step >> 3
            if nib & 1:
                d += step >> 2
            if nib & 2:
                d += step >> 1
            if nib & 4:
                d += step
            pred = max(-32768, min(32767, pred + (-d if nib & 8 else d)))
            idx = max(0, min(88, idx + _IMA_INDEX_ADJ[nib & 7]))
            nibbles.append(nib)
        while len(nibbles) % 8:
            nibbles.append(0)  # pad to whole 4-byte words
        payload = bytes(
            nibbles[j] | (nibbles[j + 1] << 4) for j in range(0, len(nibbles), 2)
        )
        blocks.append(header + payload)
    block_align = 4 + (samples_per_block - 1 + 7) // 8 * 4
    data = b"".join(b.ljust(block_align, b"\x00") for b in blocks)
    fmt = _struct.pack("<HHIIHHH", 0x11, 1, rate, rate * block_align // samples_per_block, block_align, 4, samples_per_block)
    body = (
        b"WAVE"
        + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"data" + _struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + _struct.pack("<I", len(body)) + body


def test_audio_ima_adpcm_real_decode(spark):
    """IMA ADPCM WAV (format 0x11) round-trips through the real
    decode tier: waveform recovered within codec tolerance, features
    non-stub, and a gentle sine's RMS matches the PCM ground truth."""
    import math

    from data_pipeline_childcare_spark.sources.multimodal import (
        _parse_wav_pcm,
        audio_features,
    )

    rate = 8000
    n = 1009  # an odd length exercises block padding
    samples = [int(3000 * math.sin(2 * math.pi * i / 200)) for i in range(n)]
    wav = _ima_encode(samples, rate)
    grate, gch, pcm = _parse_wav_pcm(wav)
    assert (grate, gch) == (rate, 1)
    import struct as _struct

    decoded = list(_struct.unpack("<" + "h" * (len(pcm) // 2), pcm))
    # padded tail may extend beyond the source; compare the real span
    assert len(decoded) >= n
    err = max(abs(a - b) for a, b in zip(decoded[:n], samples))
    assert err <= 200, err  # smooth signal → small adaptive steps

    df = spark.createDataFrame([("a.wav", wav)], "path string, content binary")
    row = audio_features(df).collect()[0]
    assert row["is_stub"] is False and row["sample_rate"] == rate
    true_rms = math.sqrt(sum(s * s for s in samples) / n) / 32768.0
    assert abs(row["rms"] - true_rms) < 0.01


def test_audio_g711_ulaw_alaw_real_decode(spark):
    """G.711 µ-law / A-law WAV (formats 7 / 6): published anchor
    bytes decode exactly, and a companded sine round-trips through
    the real tier within companding error (nearest-byte encoding is
    an independent brute-force search over the decode table)."""
    import math
    import struct as _struct

    from data_pipeline_childcare_spark.sources.multimodal import (
        _g711_tables,
        _parse_wav_pcm,
        audio_features,
    )

    ulaw, alaw = _g711_tables()
    # normative anchors (ITU-T G.711 tables)
    assert (ulaw[0x00], ulaw[0xFF], ulaw[0x80]) == (-32124, 0, 32124)
    assert (alaw[0x55], alaw[0xD5], alaw[0x2A], alaw[0xAA]) == (-8, 8, -32256, 32256)

    def wav(fmt_code, table):
        rate, n = 8000, 400
        samples = [int(12000 * math.sin(2 * math.pi * i / 80)) for i in range(n)]
        enc = bytes(min(range(256), key=lambda b: abs(table[b] - s)) for s in samples)
        fmt = _struct.pack("<HHIIHH", fmt_code, 1, rate, rate, 1, 8)
        body = (
            b"WAVE"
            + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
            + b"data" + _struct.pack("<I", len(enc)) + enc
        )
        return b"RIFF" + _struct.pack("<I", len(body)) + body, samples

    for fmt_code, table in ((7, ulaw), (6, alaw)):
        blob, samples = wav(fmt_code, table)
        rate, ch, pcm = _parse_wav_pcm(blob)
        assert (rate, ch) == (8000, 1)
        dec = _struct.unpack("<" + "h" * (len(pcm) // 2), pcm)
        # companding error bound: ~1/16 relative + segment-0 absolute
        assert all(abs(d - s) <= abs(s) / 12 + 40 for d, s in zip(dec, samples))
        row = audio_features(
            spark.createDataFrame([("g.wav", blob)], "path string, content binary")
        ).collect()[0]
        assert row["is_stub"] is False and row["n_samples"] == 400


def test_audio_features_stereo_downmix_and_stub(spark):
    from data_pipeline_childcare_spark.sources.multimodal import audio_features

    # opposite-phase stereo downmixes to (32767 - 32768)/2 ≈ 0
    samples = [(32767, -32768)] * 100
    wav = _make_wav(16000, 2, samples)
    df = spark.createDataFrame(
        [("s.wav", wav), ("x.mp3", b"\xff\xfb" + bytes(64))],
        "path string, content binary",
    )
    rows = {r["path"]: r for r in audio_features(df).collect()}
    assert rows["s.wav"]["is_stub"] is False
    assert rows["s.wav"]["channels"] == 2
    assert rows["s.wav"]["rms"] < 1e-4
    assert rows["x.mp3"]["is_stub"] is True and rows["x.mp3"]["sample_rate"] is None


def test_corrupt_media_falls_to_stub_not_task_failure(spark):
    """Truncated/lying RIFF containers must produce marked stub rows,
    never a failed Spark task (struct.error / ZeroDivisionError class
    of bugs)."""
    from data_pipeline_childcare_spark.sources.multimodal import (
        audio_features,
        sample_frames,
    )
    import struct as _struct

    trunc_avi = b"RIFF" + _struct.pack("<I", 200) + b"AVI " + b"LIST" + _struct.pack("<I", 180) + b"hdrl" + b"avih" + _struct.pack("<I", 56) + b"\x01\x02"  # avih body cut short
    zero_ch_fmt = _struct.pack("<HHIIHH", 1, 0, 8000, 0, 0, 16)
    zero_ch_wav = (
        b"RIFF" + _struct.pack("<I", 100) + b"WAVE"
        + b"fmt " + _struct.pack("<I", 16) + zero_ch_fmt
        + b"data" + _struct.pack("<I", 4) + b"\x01\x02\x03\x04"
    )
    short_fmt_wav = (
        b"RIFF" + _struct.pack("<I", 40) + b"WAVE"
        + b"fmt " + _struct.pack("<I", 14) + b"\x00" * 14
        + b"data" + _struct.pack("<I", 2) + b"\x01\x02"
    )
    vdf = spark.createDataFrame(
        [("t.avi", trunc_avi)], "path string, content binary"
    )
    frames = sample_frames(vdf, every_ms=100).collect()
    assert frames and all(r["is_stub"] for r in frames)
    adf = spark.createDataFrame(
        [("z.wav", zero_ch_wav), ("s.wav", short_fmt_wav)],
        "path string, content binary",
    )
    rows = audio_features(adf).collect()
    assert len(rows) == 2 and all(r["is_stub"] for r in rows)


def test_firecrawl_scraper_contract_parses_wire_shape(spark):
    """HttpFirecrawlScraper with an injected transport: Bearer auth +
    v2 payload on the wire, reference result contract out (final URL
    from metadata.sourceURL), and rows land in the fixed schema."""
    from data_pipeline_childcare_spark.sources.connectors import (
        HttpFirecrawlScraper,
        run_scrape_tasks,
    )

    seen = {}

    def transport(url, headers, payload):
        seen.update(url=url, headers=headers, payload=payload)
        return {
            "success": True,
            "data": {
                "markdown": "# 标题\n\n正文段落",
                "metadata": {"sourceURL": "https://final.example/page"},
            },
        }

    s = HttpFirecrawlScraper(api_key="fc-test", transport=transport)
    out = s({"origin_key": "k1", "url": "https://req.example"})
    assert out["status"] == "success"
    assert out["url"] == "https://final.example/page"
    assert out["content"].startswith("# 标题")
    assert seen["headers"]["Authorization"] == "Bearer fc-test"
    assert seen["payload"] == {
        "url": "https://req.example",
        "onlyMainContent": True,
        "removeBase64Images": True,
        "blockAds": True,
    }
    df = run_scrape_tasks(spark, [{"origin_key": "k1", "url": "https://req.example"}], s)
    rows = df.collect()
    assert rows[0]["status"] == "success" and rows[0]["error_message"] is None


def test_firecrawl_scraper_retry_backoff_and_error_row(spark):
    from data_pipeline_childcare_spark.sources.connectors import (
        HttpFirecrawlScraper,
        run_scrape_tasks,
    )

    calls, sleeps = [], []

    def flaky(url, headers, payload):
        calls.append(1)
        if len(calls) < 3:
            raise OSError("boom")
        return {"success": True, "data": {"markdown": "ok", "metadata": {}}}

    s = HttpFirecrawlScraper(api_key="k", transport=flaky, sleeper=sleeps.append)
    out = s({"url": "https://x.example"})
    assert len(calls) == 3 and out["status"] == "success" and out["content"] == "ok"
    assert sleeps == [1.0, 2.0]

    # API-level failure shapes (success=false, missing data/markdown)
    # all retry then degrade to the reference's failed row
    for resp in ({"success": False, "error": "nope"},
                 {"success": True},
                 {"success": True, "data": {"html": "only"}}):
        s2 = HttpFirecrawlScraper(
            api_key="k", transport=lambda u, h, p, r=resp: r, sleeper=lambda x: None
        )
        out2 = s2({"origin_key": "o", "url": "https://y.example"})
        assert out2["status"] == "failed" and out2["content"] == ""
        assert "处理失败" in out2["error_message"]
    df = run_scrape_tasks(spark, [{"origin_key": "o", "url": "https://y.example"}], s2)
    assert df.collect()[0]["status"] == "failed"


def test_firecrawl_scraper_requires_explicit_key():
    import pytest as _pytest

    from data_pipeline_childcare_spark.sources.connectors import HttpFirecrawlScraper

    with _pytest.raises(ValueError, match="api_key"):
        HttpFirecrawlScraper(api_key="")


def test_zhilian_job_source_contract():
    """Wire shape + the reference's three result envelopes: skipped on
    invalid payload (no network touch), success on code 200, failed on
    non-200 / transport death after retries."""
    from data_pipeline_childcare_spark.sources.connectors import HttpZhiLianJobSource

    calls = []

    def transport(url, headers, payload):
        calls.append(payload)
        assert headers["Content-Type"] == "application/json"
        assert isinstance(payload["page_size"], int)
        return {"code": 200, "data": [{"job": "托育师"}], "message": "ok"}

    s = HttpZhiLianJobSource(api_url="https://jobs.example/api", transport=transport)
    skipped = s({"keywords": "", "provinces": ["四川"]})
    assert skipped["status"] == "skipped" and not calls  # no wire touch

    out = s({"keywords": "托育", "provinces": ["四川"], "page_size": "20"})
    assert out["status"] == "success" and out["data"] == [{"job": "托育师"}]
    assert calls[0]["page_size"] == 20

    s2 = HttpZhiLianJobSource(
        api_url="u", transport=lambda u, h, p: {"code": 500, "message": "nope"},
        sleeper=lambda x: None,
    )
    assert s2({"keywords": "k", "provinces": ["p"]})["status"] == "failed"

    sleeps = []

    def dead(u, h, p):
        raise OSError("down")

    s3 = HttpZhiLianJobSource(api_url="u", transport=dead, sleeper=sleeps.append)
    out3 = s3({"keywords": "k", "provinces": ["p"]})
    assert out3["status"] == "failed" and "API请求失败" in out3["message"]
    assert sleeps == [1.0, 2.0]


def test_tianyan_enterprise_lookup_contract():
    from data_pipeline_childcare_spark.sources.connectors import (
        HttpTianyanEnterpriseLookup,
    )

    def transport(url, headers, params):
        assert headers["Authorization"] == "tok-1"
        assert params == {"keyword": "某某托育有限公司"}
        return {"error_code": 0, "result": {"regCapital": "100万"}, "reason": "ok"}

    t = HttpTianyanEnterpriseLookup(token="tok-1", transport=transport)
    out = t("某某托育有限公司")
    assert out["status"] == "success" and out["data"]["regCapital"] == "100万"
    assert out["query_name"] == "某某托育有限公司"

    assert t("")["status"] == "skipped"

    t2 = HttpTianyanEnterpriseLookup(
        token="tok-1",
        transport=lambda u, h, p: {"error_code": 300001, "reason": "无权限"},
        sleeper=lambda x: None,
    )
    bad = t2("公司")
    assert bad["status"] == "failed" and bad["query_name"] == "公司"


def test_jina_scraper_dual_response_shapes():
    """Jina Reader returns either a JSON envelope or raw markdown —
    both must satisfy the scrape-result contract; empty content and
    bad envelopes degrade to the failed row."""
    from data_pipeline_childcare_spark.sources.connectors import HttpJinaReaderScraper

    def json_transport(url, headers):
        assert url == "https://r.jina.ai/https://x.example/p"
        assert headers["X-Return-Format"] == "markdown"
        return (
            "application/json",
            '{"code": 200, "data": {"content": "# 正文", "url": "https://final.example"}}',
        )

    s = HttpJinaReaderScraper(api_key="jk", transport=json_transport)
    out = s({"url": "https://x.example/p"})
    assert out["status"] == "success"
    assert out["url"] == "https://final.example" and out["content"] == "# 正文"

    s2 = HttpJinaReaderScraper(
        api_key="jk", transport=lambda u, h: ("text/markdown", "# raw body")
    )
    out2 = s2({"url": "https://y.example"})
    assert out2["status"] == "success" and out2["content"] == "# raw body"
    assert out2["url"] == "https://y.example"

    for resp in (("application/json", '{"code": 403, "message": "denied"}'),
                 ("text/plain", "   ")):
        s3 = HttpJinaReaderScraper(
            api_key="jk", transport=lambda u, h, r=resp: r, sleeper=lambda x: None
        )
        bad = s3({"url": "https://z.example"})
        assert bad["status"] == "failed" and "处理失败" in bad["error_message"]


def test_tavily_scraper_contract():
    from data_pipeline_childcare_spark.sources.connectors import HttpTavilyScraper

    seen = {}

    def transport(url, headers, payload):
        seen.update(payload=payload, auth=headers["Authorization"])
        return {"results": [{"raw_content": "extracted md", "url": "https://f.example"}]}

    s = HttpTavilyScraper(api_key="tv", transport=transport)
    out = s({"origin_key": "o", "url": "https://x.example"})
    assert out["status"] == "success" and out["content"] == "extracted md"
    assert out["url"] == "https://f.example"
    assert seen["payload"] == {"urls": ["https://x.example"], "format": "markdown"}
    assert seen["auth"] == "Bearer tv"

    for resp in ({"results": []}, {"failed_results": [{"error": "x"}]},
                 {"results": [{"url": "u"}]}):
        s2 = HttpTavilyScraper(
            api_key="tv", transport=lambda u, h, p, r=resp: r, sleeper=lambda x: None
        )
        bad = s2({"url": "https://y.example"})
        assert bad["status"] == "failed" and bad["content"] == ""


def test_zhilian_non_numeric_page_size_degrades_to_failed():
    from data_pipeline_childcare_spark.sources.connectors import HttpZhiLianJobSource

    s = HttpZhiLianJobSource(
        api_url="u",
        transport=lambda u, h, p: {"code": 200, "data": [], "message": "ok"},
        sleeper=lambda x: None,
    )
    out = s({"keywords": "k", "provinces": ["p"], "page_size": "二十"})
    assert out["status"] == "failed" and "API请求失败" in out["message"]


def _search_provider_cases():
    """(ctor, prefix, wire_response, expected_urls, payload_check)"""
    from data_pipeline_childcare_spark.sources.connectors import (
        HttpFirecrawlSearchProvider,
        HttpJinaSearchProvider,
        HttpTavilySearchProvider,
    )

    return [
        (
            HttpJinaSearchProvider,
            "jina",
            {
                # reference semantics cap FIRST, then drop no-url rows
                # (多数据源获取链接.py:912 `api_results[:num_results]`)
                "data": [
                    {"url": "https://j.example/1", "title": "t1", "description": "d1", "content": "c1"},
                    {"url": "https://j.example/2", "title": "t2", "description": "d2"},
                    {"title": "past-cap, never seen"},
                ]
            },
            ["https://j.example/1", "https://j.example/2"],
            lambda p: p["q"] == "托育" and p["gl"] == "CN" and p["hl"] == "zh-cn",
        ),
        (
            HttpFirecrawlSearchProvider,
            "firecrawl",
            {
                "data": {
                    "web": [
                        {"url": "https://f.example/1", "title": "t1", "description": "d1", "markdown": "m1"},
                        {"title": "no-url dropped"},
                        {"url": "https://f.example/2", "title": "t2"},
                    ]
                }
            },
            ["https://f.example/1", "https://f.example/2"],
            lambda p: p["query"] == "托育" and p["limit"] >= 1,
        ),
        (
            HttpTavilySearchProvider,
            "tavily",
            {
                "results": [
                    {"url": "https://t.example/1", "title": "t1", "content": "c1", "score": 0.9},
                    {"title": "no-url dropped"},
                    {"url": "https://t.example/2", "title": "t2", "content": "c2", "score": 0.5},
                ]
            },
            ["https://t.example/1", "https://t.example/2"],
            lambda p: p["query"] == "托育"
            and p["search_depth"] == "basic"
            and p["max_results"] >= 1,
        ),
    ]


def test_search_provider_family_contract_parses_wire_shapes(spark):
    """All three remaining search providers: wire shape, no-url drop,
    cap, and drop-in normalization through run_search_tasks."""
    from data_pipeline_childcare_spark.sources.connectors import run_search_tasks

    for ctor, prefix, wire, want_urls, payload_ok in _search_provider_cases():
        seen = {}

        def transport(url, payload, _w=wire, _ok=payload_ok, _s=seen):
            assert _ok(payload), payload
            _s["url"] = url
            return _w

        p = ctor(api_key="k", transport=transport)
        raws = p("托育", 2)
        assert [r[f"{prefix}_url"] for r in raws] == want_urls, prefix
        assert all(r["query"] == "托育" for r in raws)
        df = run_search_tasks(spark, [("托育", prefix, "ok1")], {prefix: p})
        rows = df.collect()
        assert {r["provider"] for r in rows} == {prefix}
        assert {r["url"] for r in rows} == set(want_urls)


def test_search_provider_family_retry_backoff_and_error_row():
    for ctor, prefix, wire, _, _ok in _search_provider_cases():
        calls, sleeps = [], []

        def flaky(url, payload, _w=wire, _c=calls):
            _c.append(1)
            if len(_c) < 3:
                raise OSError("boom")
            return _w

        p = ctor(api_key="k", transport=flaky, sleeper=sleeps.append)
        out = p("q", 2)
        assert len(calls) == 3 and out and f"{prefix}_url" in out[0], prefix
        assert sleeps == [1.0, 2.0], prefix

        def dead(url, payload):
            raise OSError("down")

        p2 = ctor(api_key="k", transport=dead, sleeper=lambda s: None)
        out2 = p2("q", 1)
        assert len(out2) == 1 and f"{prefix}_error" in out2[0], prefix

        import pytest as _pytest

        with _pytest.raises(ValueError):
            ctor(api_key="")


def test_tuoyu_registry_pagination_contract(spark):
    """S1: page-1 discovery, full fan-out, max_pages cap, per-page
    error tolerance, API-code guard, and Spark landing."""
    from data_pipeline_childcare_spark.sources.connectors import (
        HttpTuoyuRegistrySource,
    )

    def make_transport(fail_pages=(), bad_code_pages=()):
        seen = []

        def transport(url, params):
            page = params["pageNum"]
            seen.append(page)
            if page in fail_pages:
                raise OSError(f"page {page} down")
            if page in bad_code_pages:
                return {"code": "999999", "message": "rate limited"}
            return {
                "code": "000000",
                "responseData": {
                    "totalRecord": 25,
                    "totalPage": 3,
                    "dataList": [
                        {"机构名称": f"园{page}-{i}", "区域编号": f"{page}{i}"}
                        for i in range(2 if page == 3 else 10)
                    ],
                },
            }

        transport.seen = seen
        return transport

    t = make_transport()
    src = HttpTuoyuRegistrySource(base_url="https://registry.example/q", transport=t)
    out = src.scrape_all(page_size=10)
    assert out["total_record"] == 25 and out["total_page"] == 3
    assert len(out["records"]) == 22 and out["errors"] == []
    assert t.seen == [1, 2, 3]
    # records land in Spark as a normal DataFrame
    df = spark.createDataFrame(out["records"])
    assert df.count() == 22

    # max_pages caps the fan-out
    t2 = make_transport()
    src2 = HttpTuoyuRegistrySource(base_url="u", transport=t2)
    assert len(src2.scrape_all(max_pages=2)["records"]) == 20 and t2.seen == [1, 2]

    # a dead middle page degrades to an errors entry, crawl continues
    t3 = make_transport(fail_pages=(2,))
    src3 = HttpTuoyuRegistrySource(base_url="u", transport=t3, sleeper=lambda s: None)
    out3 = src3.scrape_all()
    assert len(out3["records"]) == 12 and len(out3["errors"]) == 1

    # non-000000 API code on page 1 raises after retries
    t4 = make_transport(bad_code_pages=(1,))
    src4 = HttpTuoyuRegistrySource(base_url="u", transport=t4, sleeper=lambda s: None)
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        src4.scrape_all()
    with _pytest.raises(ValueError):
        HttpTuoyuRegistrySource(base_url="")


def test_tuoyu_registry_api_code_not_retried_and_systemic_abort():
    from data_pipeline_childcare_spark.sources.connectors import (
        HttpTuoyuRegistrySource,
    )

    calls = []

    def transport(url, params):
        calls.append(params["pageNum"])
        if params["pageNum"] == 1:
            return {
                "code": "000000",
                "responseData": {"totalRecord": 100, "totalPage": 10, "dataList": [{"a": 1}]},
            }
        return {"code": "999999", "message": "key revoked"}

    src = HttpTuoyuRegistrySource(base_url="u", transport=transport, sleeper=lambda s: None)
    out = src.scrape_all(max_consecutive_errors=3)
    # deterministic API-code errors are NOT retried: one call per page
    assert calls == [1, 2, 3, 4]
    # abort entry after the consecutive-error budget
    assert len(out["errors"]) == 4 and "aborted" in out["errors"][-1]
    assert out["records"] == [{"a": 1}]


def test_tuoyu_registry_coerces_wire_total_types():
    """Servers returning totalPage/totalRecord as strings (or garbage)
    must not raise TypeError in the page fan-out: numeric strings are
    coerced, non-numeric values degrade to a single-page crawl."""
    from data_pipeline_childcare_spark.sources.connectors import (
        HttpTuoyuRegistrySource,
    )

    def make(total_page, total_record):
        def transport(url, params):
            return {
                "code": "000000",
                "responseData": {
                    "totalRecord": total_record,
                    "totalPage": total_page,
                    "dataList": [{"p": params["pageNum"]}],
                },
            }

        return HttpTuoyuRegistrySource(base_url="u", transport=transport)

    out = make("2", "15").scrape_all()
    assert out["total_page"] == 2 and out["total_record"] == 15
    assert [r["p"] for r in out["records"]] == [1, 2]

    out2 = make("garbage", None).scrape_all()
    assert out2["total_page"] == 0 and out2["total_record"] == 0
    assert [r["p"] for r in out2["records"]] == [1] and out2["errors"] == []


def test_search_providers_null_result_lists_mean_empty_not_error():
    """An explicit JSON null result list is zero results, not a
    retried error."""
    for ctor, prefix, _wire, _urls, _ok in _search_provider_cases():
        calls = []
        null_wire = (
            {"data": None}
            if prefix == "jina"
            else {"data": {"web": None}}
            if prefix == "firecrawl"
            else {"results": None}
        )

        def transport(url, payload, _w=null_wire, _c=calls):
            _c.append(1)
            return _w

        p = ctor(api_key="k", transport=transport, sleeper=lambda s: None)
        out = p("q", 3)
        assert out == [] and len(calls) == 1, prefix


def test_warc_parse_and_response_extraction(spark):
    """WARC reader: multi-record parse (plain + per-stream gzip),
    response-only filtering, HTTP layer split, corrupt blob → error
    row, non-HTTP payloads passed through."""
    import gzip as _gzip

    from data_pipeline_childcare_spark.sources.warc import (
        parse_warc,
        read_warc_responses,
        split_http_response,
    )

    def rec(rtype, rid, extra, payload):
        head = (
            f"WARC/1.0\r\nWARC-Type: {rtype}\r\nWARC-Record-ID: {rid}\r\n"
            + extra
            + f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode()
        return head + payload + b"\r\n\r\n"

    body = "<html>你好 world</html>".encode()
    http = (
        b"HTTP/1.1 301 Moved\r\nLocation: /x\r\nContent-Type: text/html\r\n\r\n" + body
    )
    warc = (
        rec("warcinfo", "<urn:i>", "", b"software: t\r\n")
        + rec("request", "<urn:q>", "WARC-Target-URI: https://a/\r\n", b"GET /\r\n\r\n")
        + rec("response", "<urn:r>", "WARC-Target-URI: https://a/\r\n", http)
        + rec("response", "<urn:r2>", "WARC-Target-URI: https://b/\r\n", b"not-http-payload")
    )
    recs = parse_warc(warc)
    assert [r["headers"]["warc-type"] for r in recs] == [
        "warcinfo", "request", "response", "response",
    ]
    assert parse_warc(_gzip.compress(warc)) == recs  # gzip path identical
    status, ctype, got_body = split_http_response(http)
    assert (status, ctype, got_body) == (301, "text/html", body)
    assert split_http_response(b"raw bytes") == (None, None, b"raw bytes")

    df = spark.createDataFrame(
        [("a.warc", warc), ("b.warc.gz", _gzip.compress(warc)), ("bad.warc", b"GARBAGE")],
        "path string, content binary",
    )
    rows = read_warc_responses(df).collect()
    by = {}
    for r in rows:
        by.setdefault(r["path"], []).append(r)
    for p in ("a.warc", "b.warc.gz"):
        assert [r["record_id"] for r in by[p]] == ["<urn:r>", "<urn:r2>"]
        assert by[p][0]["http_status"] == 301 and bytes(by[p][0]["body"]) == body
        assert by[p][1]["http_status"] is None  # non-HTTP payload
        assert bytes(by[p][1]["body"]) == b"not-http-payload"
    assert len(by["bad.warc"]) == 1 and by["bad.warc"][0]["error"]

    # truncation / garbage keep the ValueError contract in the parser
    import pytest as _pytest

    with _pytest.raises(ValueError, match="payload exceeds"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 99999\r\n\r\nshort")
    with _pytest.raises(ValueError, match="version line"):
        parse_warc(b"NOT A WARC")

    # gzip-bomb guard: a tiny compressed stream inflating past the cap
    # raises loudly instead of exhausting memory (archives.py parity)
    bomb = _gzip.compress(b"\x00" * (4 << 20))
    with _pytest.raises(ValueError, match="decompressed bytes"):
        parse_warc(bomb, max_decompressed_bytes=1 << 20)


def test_warc_documents_end_to_end(spark):
    """WARC → parse_documents composition: Content-Type drives the
    format (HTML stripped, JSON fenced), falling back to sniffing."""
    from data_pipeline_childcare_spark.sources.warc import warc_documents

    def rec(rid, uri, ctype, body):
        http = (
            f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n\r\n".encode() + body
        )
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: {rid}\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        return head + http + b"\r\n\r\n"

    warc = rec(
        "<urn:1>", "https://a/page", "text/html; charset=utf-8",
        b"<html><script>x()</script><body><p>Crawl body text</p></body></html>",
    ) + rec("<urn:2>", "https://a/data.json", "application/json", b'{"k": 1}')
    df = spark.createDataFrame([("s.warc", warc)], "path string, content binary")
    got = {r["path"]: r for r in warc_documents(df).collect()}
    assert "Crawl body text" in got["https://a/page"]["content"]
    assert "x()" not in got["https://a/page"]["content"]
    assert got["https://a/data.json"]["content"].startswith("```json")


def test_archive_members_zip_and_tar(spark):
    """Archive ingestion: ZIP and TAR.GZ explode to member rows, a
    corrupt archive degrades to an error row, directories and empty
    members drop, and archive_documents parses members end-to-end."""
    import io as _io
    import tarfile as _tarfile
    import zipfile as _zipfile

    from data_pipeline_childcare_spark.sources.archives import (
        archive_documents,
        iter_archive_members,
        read_archive_members,
    )

    zbuf = _io.BytesIO()
    with _zipfile.ZipFile(zbuf, "w") as zf:
        zf.writestr("docs/a.txt", "alpha text")
        zf.writestr("docs/", "")           # directory: dropped
        zf.writestr("empty.bin", "")       # zero bytes: dropped
        zf.writestr("b.json", '{"k": 7}')
    zip_blob = zbuf.getvalue()

    tbuf = _io.BytesIO()
    with _tarfile.open(fileobj=tbuf, mode="w:gz") as tf:
        payload = b"<html><body><p>tar body</p></body></html>"
        info = _tarfile.TarInfo("site/page.html")
        info.size = len(payload)
        tf.addfile(info, _io.BytesIO(payload))
    tar_blob = tbuf.getvalue()

    assert [m for m, _ in iter_archive_members(zip_blob)] == ["docs/a.txt", "b.json"]
    assert [m for m, _ in iter_archive_members(tar_blob)] == ["site/page.html"]

    df = spark.createDataFrame(
        [("c.zip", zip_blob), ("c.tgz", tar_blob), ("bad.zip", b"PK\x03\x04junk")],
        "path string, content binary",
    )
    rows = read_archive_members(df).collect()
    ok = [(r["path"], r["member"]) for r in rows if r["error"] is None]
    assert set(ok) == {("c.zip", "docs/a.txt"), ("c.zip", "b.json"), ("c.tgz", "site/page.html")}
    assert [r["path"] for r in rows if r["error"]] == ["bad.zip"]

    parsed = {r["path"]: r["content"] for r in archive_documents(df).collect()}
    assert parsed["c.zip::docs/a.txt"] == "alpha text"
    assert parsed["c.zip::b.json"].startswith("```json")
    assert "tar body" in parsed["c.tgz::site/page.html"]


def test_warc_bare_lf_headers_split_correctly():
    """Old servers emit LF-only HTTP headers; a CRLFCRLF inside the
    BODY must not be mistaken for the header/body boundary."""
    from data_pipeline_childcare_spark.sources.warc import split_http_response

    payload = (
        b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n"
        b"<html>\r\n\r\n</html>"
    )
    status, ctype, body = split_http_response(payload)
    assert (status, ctype) == (200, "text/html")
    assert body == b"<html>\r\n\r\n</html>"


def test_archive_truncated_targz_valueerror_contract():
    import io as _io
    import tarfile as _tarfile

    import pytest as _pytest

    from data_pipeline_childcare_spark.sources.archives import iter_archive_members

    tbuf = _io.BytesIO()
    with _tarfile.open(fileobj=tbuf, mode="w:gz") as tf:
        payload = b"x" * 4096
        info = _tarfile.TarInfo("a.txt")
        info.size = len(payload)
        tf.addfile(info, _io.BytesIO(payload))
    blob = tbuf.getvalue()
    for cut in (20, len(blob) // 2, len(blob) - 5):
        try:
            list(iter_archive_members(blob[:cut]))
        except ValueError:
            pass  # the only allowed failure mode (EOFError must not leak)


def test_encode_wav_pcm16_round_trip():
    """The fixture WAV writer must round-trip losslessly through the
    real RIFF parse, including the odd-length data pad."""
    import struct

    from data_pipeline_childcare_spark.sources.multimodal import (
        _parse_wav_pcm,
        encode_wav_pcm16,
    )

    samples = [((i * 37) % 2001) - 1000 for i in range(101)]
    pcm = struct.pack(f"<{len(samples)}h", *samples)
    rate, ch, out = _parse_wav_pcm(encode_wav_pcm16(22050, 1, pcm))
    assert (rate, ch) == (22050, 1)
    assert out == pcm


def test_audio_fingerprint_energy_delta_bits():
    """Fingerprint bits follow the exact integer energy-delta rule;
    stereo uses the first channel only; short and corrupt blobs
    degrade (zero fp / marked stub) instead of raising."""
    import struct

    from data_pipeline_childcare_spark.sources.multimodal import (
        audio_fingerprint_bytes,
        encode_wav_pcm16,
    )

    # loud/quiet alternating windows -> alternating delta signs
    samples = [1000 if (i // 8) % 2 == 0 else 10 for i in range(512)]
    wav = encode_wav_pcm16(8000, 1, struct.pack("<512h", *samples))
    rate, n, v, stub = audio_fingerprint_bytes(wav)
    assert (rate, n, stub) == (8000, 512, False)
    expected = sum(1 << w for w in range(63) if w % 2 == 1)  # quiet->loud rises
    assert v == expected
    # stereo: channel 0 loud-alternating, channel 1 constant noise
    inter = []
    for i in range(512):
        inter += [samples[i], 777]
    wav2 = encode_wav_pcm16(8000, 2, struct.pack(f"<{len(inter)}h", *inter))
    assert audio_fingerprint_bytes(wav2)[2] == expected
    # shorter than one window per bit -> all-zero fp, not an error
    tiny = encode_wav_pcm16(8000, 1, struct.pack("<8h", *([5] * 8)))
    assert audio_fingerprint_bytes(tiny)[2:] == (0, False)
    # not audio at all -> deterministic marked stub
    a = audio_fingerprint_bytes(b"not audio")
    assert a == audio_fingerprint_bytes(b"not audio")
    assert a[3] is True
