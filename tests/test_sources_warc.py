"""WET/WARC source reader: byte-exact record framing, gzip-by-magic,
type filtering, and the refuse-to-truncate contract."""

from __future__ import annotations

import gzip
import os

import pytest


def _wet_bytes() -> bytes:
    """A synthetic two-page WET member: warcinfo preamble + two
    conversion records.  The second payload is multibyte UTF-8 whose
    byte length (19) exceeds its character length (13) — framing by
    characters instead of bytes would desynchronize on it."""

    def rec(wtype, rid, payload: bytes, url=None, date=None):
        h = [b"WARC/1.0"]
        h.append(b"WARC-Type: " + wtype.encode())
        h.append(b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">")
        if url:
            h.append(b"WARC-Target-URI: " + url.encode())
        if date:
            h.append(b"WARC-Date: " + date.encode())
        h.append(b"Content-Length: " + str(len(payload)).encode())
        return b"\r\n".join(h) + b"\r\n\r\n" + payload + b"\r\n\r\n"

    p1 = b"Hello crawl world.\nSecond line."
    p2 = "café naïve 世界".encode()
    assert len(p2) == 19 and len(p2.decode()) == 13
    return (
        rec("warcinfo", "info-1", b"software: synthetic-wet 1.0\r\n")
        + rec(
            "conversion",
            "rec-a",
            p1,
            url="https://example.com/a",
            date="2026-08-16T00:00:00Z",
        )
        + rec(
            "conversion",
            "rec-b",
            p2,
            url="https://example.com/b",
            date="2026-08-16T00:00:01Z",
        )
    )


def test_parse_warc_records_byte_exact_framing():
    """Pure-parser unit: all three records, byte-exact payloads, and
    LF-only header blocks parse identically to CRLF."""
    from dfsql_spark.sources.warc import parse_warc_records

    recs = list(parse_warc_records(_wet_bytes()))
    assert [r["warc_type"] for r in recs] == [
        "warcinfo",
        "conversion",
        "conversion",
    ]
    assert recs[1]["url"] == "https://example.com/a"
    assert recs[2]["payload"].decode() == "café naïve 世界"
    assert recs[2]["content_length"] == 19

    lf = _wet_bytes().replace(b"\r\n", b"\n")
    assert [r["url"] for r in parse_warc_records(lf)] == [
        r["url"] for r in recs
    ]


def test_parse_warc_records_roundtrip_fuzz():
    """Generative framing proof: members built from RANDOM payloads —
    including payloads that themselves contain 'WARC/1.0' version
    lines, CRLF/LF runs, blank lines, and multibyte UTF-8 — parse
    back to the EXACT constructed (type, url, payload) sequence.
    Content-Length slicing means adversarial payload bytes can never
    desynchronize the stream; this is the property that makes the
    reader safe on 80k-member crawls where one mis-framed record
    silently shifts every record after it."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dfsql_spark.sources.warc import parse_warc_records

    payload_s = st.one_of(
        st.binary(min_size=0, max_size=60),
        st.sampled_from(
            [
                b"WARC/1.0\r\nWARC-Type: fake\r\n\r\n",  # embedded record
                b"\r\n\r\n\r\n",  # blank-line runs (inter-record padding)
                b"Content-Length: 999\n\n",
                "café 世界".encode(),  # multibyte UTF-8
                b"\n\nWARC/",
            ]
        ),
    )
    rec_s = st.tuples(
        st.sampled_from(["conversion", "warcinfo", "metadata"]),
        st.integers(min_value=0, max_value=99),  # url suffix
        payload_s,
    )

    @settings(max_examples=40, deadline=None)
    @given(st.lists(rec_s, min_size=1, max_size=6), st.booleans())
    def inner(specs, crlf):
        nl = b"\r\n" if crlf else b"\n"
        member = b""
        for wtype, u, payload in specs:
            member += (
                b"WARC/1.0" + nl
                + b"WARC-Type: " + wtype.encode() + nl
                + b"WARC-Target-URI: https://f.com/" + str(u).encode() + nl
                + b"Content-Length: " + str(len(payload)).encode() + nl
                + nl + payload + nl + nl
            )
        got = list(parse_warc_records(member))
        assert [
            (r["warc_type"], r["url"], r["payload"]) for r in got
        ] == [
            (w, f"https://f.com/{u}", p) for w, u, p in specs
        ]

    inner()


def test_parse_warc_records_refuses_malformed():
    """Truncated payloads, missing Content-Length, and non-WARC bytes
    raise instead of silently dropping trailing records."""
    from dfsql_spark.sources.warc import parse_warc_records

    good = _wet_bytes()
    # cut into the LAST record's payload (it ends with 19 payload
    # bytes + 4 trailing CRLF bytes): a short read mid-payload
    with pytest.raises(ValueError, match="truncated"):
        list(parse_warc_records(good[:-10]))
    with pytest.raises(ValueError, match="not a WARC member"):
        list(parse_warc_records(b"plain text file"))
    with pytest.raises(ValueError, match="Content-Length"):
        list(
            parse_warc_records(b"WARC/1.0\r\nWARC-Type: conversion\r\n\r\nx")
        )


def test_read_wet_plain_gzip_and_type_filter(spark, tmp_path):
    """End-to-end over a directory mixing an uncompressed member and a
    gzipped one (magic-byte detection — the .wet extension lies):
    conversion-only default, exact texts/urls, per-member provenance,
    and warc_types=None keeping the warcinfo rows."""
    from dfsql_spark.sources.warc import read_wet

    d = tmp_path / "wet"
    d.mkdir()
    (d / "m1.warc.wet").write_bytes(_wet_bytes())
    # gzipped but WITHOUT a .gz extension: magic bytes must win
    (d / "m2.warc.wet").write_bytes(gzip.compress(_wet_bytes()))

    out = read_wet(spark, str(d)).collect()
    assert len(out) == 4  # 2 conversion records x 2 members
    by_member: dict = {}
    for r in out:
        by_member.setdefault(os.path.basename(r.source_file), []).append(r)
    for member, rows in by_member.items():
        urls = sorted(r.url for r in rows)
        assert urls == ["https://example.com/a", "https://example.com/b"]
        texts = {r.url: r.text for r in rows}
        assert texts["https://example.com/a"].startswith("Hello crawl")
        assert texts["https://example.com/b"] == "café naïve 世界"
        assert all(r.warc_type == "conversion" for r in rows)
    assert set(by_member) == {"m1.warc.wet", "m2.warc.wet"}

    everything = read_wet(spark, str(d), warc_types=None).collect()
    assert len(everything) == 6
    assert sum(r.warc_type == "warcinfo" for r in everything) == 2


def test_read_wet_composes_with_text_operators(spark, tmp_path):
    """The documented downstream hand-off: WET rows feed url
    canonicalization and a text signal without any adapter glue."""
    from dfsql_spark.operators.text import token_count
    from dfsql_spark.operators.web import canonicalize_url
    from dfsql_spark.sources.warc import read_wet

    f = tmp_path / "m.warc.wet.gz"
    f.write_bytes(gzip.compress(_wet_bytes()))
    docs = read_wet(spark, str(f))
    out = (
        canonicalize_url(docs, url_col="url")
        .withColumn("n_tokens", token_count("text"))
        .collect()
    )
    assert len(out) == 2
    assert all(r.n_tokens > 0 for r in out)
    assert all(r.canonical_url.startswith("https://example.com/") for r in out)


def test_wet_through_create_table_sql_surface(spark, tmp_path):
    """The catalog path end-to-end: CREATE TABLE over a .warc.wet.gz
    file (format inferred through the compression strip), then plain
    SQL over the resulting documents view."""
    from dfsql_spark.datasource import DataSource
    from dfsql_spark.sources.tables import infer_format

    assert infer_format("m.warc.wet.gz") == "wet"
    assert infer_format("m.wet") == "wet"

    f = tmp_path / "m.warc.wet.gz"
    f.write_bytes(gzip.compress(_wet_bytes()))
    ds = DataSource(
        spark=spark, metadata_dir=str(tmp_path / "meta"), cache=False
    )
    ds.query(f"CREATE TABLE crawl ('{f}')")
    out = ds.query(
        "SELECT url FROM crawl WHERE text LIKE 'Hello.*' "
    )
    vals = out.values.tolist() if hasattr(out, "values") else [[out]]
    assert vals == [["https://example.com/a"]]


def _warc_bytes() -> bytes:
    """A raw WARC member: warcinfo + two response records (an HTML
    page whose Content-Type lies about a PNG body, and a real text
    page) + one metadata record with a non-HTTP payload."""

    def rec(wtype, rid, payload: bytes, url=None):
        h = [b"WARC/1.0", b"WARC-Type: " + wtype.encode(),
             b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">"]
        if url:
            h.append(b"WARC-Target-URI: " + url.encode())
        h.append(b"Content-Length: " + str(len(payload)).encode())
        return b"\r\n".join(h) + b"\r\n\r\n" + payload + b"\r\n\r\n"

    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 20
    http1 = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
             b"Server: x\r\n\r\n" + png)
    http2 = (b"HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n\r\n"
             b"not here")
    return (
        rec("warcinfo", "i", b"software: synth\r\n")
        + rec("response", "r1", http1, url="https://m.com/img")
        + rec("response", "r2", http2, url="https://m.com/miss")
        + rec("metadata", "m1", b"fetch: ok", url="https://m.com/img")
    )


def test_read_warc_http_split_and_media_sniff(spark, tmp_path):
    """read_warc splits the HTTP envelope byte-exactly (binary body
    untouched), keeps response records only by default, and feeds
    sniff_media_format — which exposes the lying Content-Type."""
    import pyspark.sql.functions as F

    from dfsql_spark.operators.multimodal import sniff_media_format
    from dfsql_spark.sources.warc import read_warc

    f = tmp_path / "m.warc.gz"
    f.write_bytes(gzip.compress(_warc_bytes()))
    out = sniff_media_format(
        read_warc(spark, str(f)), bytes_col="payload", out_col="sniffed"
    )
    rows = {r.url: r for r in out.collect()}
    assert set(rows) == {"https://m.com/img", "https://m.com/miss"}
    img = rows["https://m.com/img"]
    assert img.http_status == 200
    assert img.content_type == "text/html; charset=utf-8"
    assert bytes(img.payload)[:8] == b"\x89PNG\r\n\x1a\n"
    assert img.sniffed == "png"  # the header lied; the bytes don't
    miss = rows["https://m.com/miss"]
    assert miss.http_status == 404 and bytes(miss.payload) == b"not here"

    # warc_types=None keeps the non-HTTP records with NULL envelope
    everything = {r.record_id: r for r in
                  read_warc(spark, str(f), warc_types=None).collect()}
    meta = everything["<urn:uuid:m1>"]
    assert meta.http_status is None and bytes(meta.payload) == b"fetch: ok"
