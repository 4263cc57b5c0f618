"""WARC source/sink: grammar fixtures (hand-written bytes, not our own
encoder), gzip member handling, corrupt-record resync, and the
build->assemble->parse roundtrip on real testdata."""

from __future__ import annotations

import gzip

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from clif_spark import io, warc

SF_DIR = "/root/testdata/sf0.001"


def _rec(warc_type: str, headers: dict[str, str], block: bytes) -> bytes:
    head = [b"WARC/1.1", f"WARC-Type: {warc_type}".encode()]
    head += [f"{k}: {v}".encode() for k, v in headers.items()]
    head.append(b"Content-Length: " + str(len(block)).encode())
    return b"\r\n".join(head) + b"\r\n\r\n" + block + b"\r\n\r\n"


def _fixture_file() -> bytes:
    """A WARC file exercising the grammar beyond what our builder emits:
    warcinfo + request + response + metadata record types, a folded
    (continuation) header, and a non-HTTP resource block."""
    info = _rec("warcinfo",
                {"WARC-Record-ID": "<urn:uuid:aaa>",
                 "Content-Type": "application/warc-fields"},
                b"software: clif-spark-tests\r\n")
    req = _rec("request",
               {"WARC-Record-ID": "<urn:uuid:bbb>",
                "WARC-Target-URI": "https://example.org/a"},
               b"GET /a HTTP/1.1\r\nHost: example.org\r\n\r\n")
    body = b"hello <b>world</b>"
    http = (b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html;\r\n charset=utf-8\r\n"  # folded
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
            + body)
    resp = _rec("response",
                {"WARC-Record-ID": "<urn:uuid:ccc>",
                 "WARC-Target-URI": "https://example.org/a",
                 "Content-Type": "application/http;msgtype=response"},
                http)
    meta = _rec("metadata",
                {"WARC-Record-ID": "<urn:uuid:ddd>",
                 "WARC-Target-URI": "https://example.org/a"},
                b"fetchTimeMs: 12\r\n")
    return info + req + resp + meta


def test_parse_fixture_grammar():
    rows = list(warc.parse_warc_bytes(_fixture_file(), 7))
    assert [r[2] for r in rows] == ["warcinfo", "request", "response",
                                    "metadata"]
    resp = rows[2]
    assert resp[0] == 7
    assert resp[3] == "urn:uuid:ccc"
    assert resp[4] == "https://example.org/a"
    assert resp[6] == 200
    # folded header line reassembles with single-space join
    assert resp[7] == "text/html; charset=utf-8"
    assert resp[8] == b"hello <b>world</b>"
    # non-response records keep their raw block as payload
    assert rows[0][8].startswith(b"software: clif-spark-tests")


def test_parse_resyncs_past_corrupt_record():
    good = _fixture_file()
    corrupt = b"WARC/1.1\r\nContent-Length: oops\r\n\r\njunk\r\n\r\n"
    rows = list(warc.parse_warc_bytes(corrupt + good, 1))
    assert rows[0][2] == "invalid" and rows[0][1] == 0
    assert [r[2] for r in rows[1:]] == ["warcinfo", "request", "response",
                                        "metadata"]
    # truncated tail: visible, not silently dropped, no infinite loop
    rows = list(warc.parse_warc_bytes(good + good[: len(good) // 2], 1))
    assert rows[-1][2] == "invalid"
    assert [r[2] for r in rows[:4]] == ["warcinfo", "request", "response",
                                        "metadata"]


def test_parse_multi_member_gzip(spark):
    """Per-record gzip members (the Common Crawl .warc.gz layout) parse
    identically to the plain file, through the Spark path."""
    plain = _fixture_file()
    offsets = [r[1] for r in warc.parse_warc_bytes(plain, 0)] + [len(plain)]
    recs = [plain[a:b] for a, b in zip(offsets, offsets[1:])]
    assert b"".join(recs) == plain
    gz = b"".join(gzip.compress(r, mtime=0) for r in recs)
    df = spark.createDataFrame([(0, plain), (1, gz)],
                               "file_id long, content binary")
    out = warc.parse_warc(df).groupBy("file_id") \
              .agg(F.count_if(F.col("warc_type") == "response").alias("n")) \
              .collect()
    assert {r["file_id"]: r["n"] for r in out} == {0: 1, 1: 1}


def test_roundtrip_on_testdata(spark):
    """build -> assemble(mixed gzip) -> parse inverts exactly on the real
    documents table, including empty-payload docs."""
    docs = io.load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text",
        F.concat(F.lit("https://corpus.example/"), F.col("source"),
                 F.lit("/"), F.col("doc_id")).alias("url"),
        (F.col("doc_id") % 8).alias("file_id"))
    files = warc.assemble_warc_files(
        warc.build_warc_records(docs), gzip_records="mixed")
    parsed = warc.parse_warc(files)
    back = parsed.select(
        F.regexp_extract("target_uri", r"/(\d+)$", 1).cast("long")
         .alias("doc_id"),
        F.col("payload").cast("string").alias("text"),
        "warc_type", "http_status")
    orig = docs.select("doc_id", "text")
    assert back.filter(F.col("warc_type") != "response").count() == 0
    assert back.filter(F.col("http_status") != 200).count() == 0
    assert back.count() == orig.count()
    assert back.select("doc_id", "text").exceptAll(orig).count() == 0
    assert orig.exceptAll(back.select("doc_id", "text")).count() == 0


def test_assembled_bytes_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"payload {i}", f"https://e.x/{i}", 0) for i in range(20)],
        "doc_id long, text string, url string, file_id long")
    recs = warc.build_warc_records(docs)
    a = warc.assemble_warc_files(recs, gzip_records=True).collect()[0]
    b = warc.assemble_warc_files(
        recs.repartition(7), gzip_records=True).collect()[0]
    assert bytes(a["content"]) == bytes(b["content"])


_payloads = st.lists(
    st.binary(min_size=0, max_size=400), min_size=1, max_size=8)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(payloads=_payloads, gz=st.booleans(), data=st.data())
def test_parser_framing_property(payloads, gz, data):
    """Property: the parser's framing is driven ONLY by Content-Length —
    payloads containing CRLF runs, blank lines, fake 'WARC/1.1' magic,
    or any other bytes round-trip exactly, in plain and per-record-gzip
    files alike. Records here are written by an independent in-test
    serializer (not clif_spark.warc's builder), so this is not the
    builder validating itself."""
    # adversarial injections the framing must shrug off
    poison = data.draw(st.sampled_from(
        [b"", b"\r\n\r\n", b"WARC/1.1\r\n", b"\r\nWARC/1.1\r\n\r\n",
         b"Content-Length: 9\r\n\r\n"]))
    payloads = [poison + p for p in payloads]
    recs = []
    for i, p in enumerate(payloads):
        head = (f"WARC/1.1\r\nWARC-Type: resource\r\n"
                f"WARC-Record-ID: <urn:uuid:{i}>\r\n"
                f"WARC-Target-URI: https://e.x/{i}\r\n"
                f"Content-Length: {len(p)}\r\n\r\n").encode()
        recs.append(head + p + b"\r\n\r\n")
    buf = (b"".join(gzip.compress(r, mtime=0) for r in recs)
           if gz else b"".join(recs))
    if buf[:2] == b"\x1f\x8b":
        buf = gzip.decompress(buf)
    rows = list(warc.parse_warc_bytes(buf, 0))
    assert [r[2] for r in rows] == ["resource"] * len(payloads)
    assert [r[8] for r in rows] == payloads
    assert [r[4] for r in rows] == [f"https://e.x/{i}"
                                    for i in range(len(payloads))]


def test_multibyte_payload_roundtrip(spark):
    """Content-Length is BYTES: multibyte UTF-8 payloads (CJK, emoji,
    combining marks) must survive the Catalyst builder's octet_length
    framing and decode back identically."""
    rows = [(0, "héllo wörld —", "https://e.x/0", 0),
            (1, "日本語のテキスト", "https://e.x/1", 0),
            (2, "emoji \U0001f600\U0001f680 end", "https://e.x/2", 0),
            (3, "é́́", "https://e.x/3", 0)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, url string, file_id long")
    files = warc.assemble_warc_files(warc.build_warc_records(docs))
    out = {r["target_uri"]: bytes(r["payload"]).decode("utf-8")
           for r in warc.parse_warc(files).collect()}
    assert out == {u: t for _, t, u, _ in rows}


def _http_resp(body: bytes, ctype: str) -> bytes:
    return (f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode() + body


def test_charset_aware_payload_text():
    """payload_text honors the declared charset, falls back utf-8 ->
    latin-1 on lies, and is NULL for non-text content — one mislabeled
    page never fails the task."""
    cases = [
        # (body bytes, declared content-type, expected text)
        ("déjà vu".encode("latin-1"),
         'text/html; charset="ISO-8859-1"', "déjà vu"),
        ("日本語".encode("utf-8"), "text/html; charset=utf-8", "日本語"),
        # declared utf-8 but actually latin-1: fallback decodes, keeps row
        ("café".encode("latin-1"), "text/html; charset=utf-8", "café"),
        # unknown charset name: fallback chain handles it
        (b"plain", "text/plain; charset=x-bogus-enc", "plain"),
        # no charset param at all: utf-8 first
        ("ü".encode("utf-8"), "text/html", "ü"),
        # binary content type: text view suppressed
        (b"\x89PNG\r\n", "image/png", None),
    ]
    recs = []
    for i, (body, ctype, _) in enumerate(cases):
        http = _http_resp(body, ctype)
        recs.append(_rec("response",
                         {"WARC-Record-ID": f"<urn:uuid:{i}>",
                          "WARC-Target-URI": f"https://e.x/{i}"}, http))
    rows = list(warc.parse_warc_bytes(b"".join(recs), 0))
    assert [r[9] for r in rows] == [exp for _, _, exp in cases]
    # the exact bytes always ride alongside, decoded or not
    assert [r[8] for r in rows] == [b for b, _, _ in cases]


def test_write_warc_files_sink(spark, tmp_path):
    """The interchange sink writes real .warc/.warc.gz files (extension
    from content magic, atomic rename) that round-trip through the
    binaryFile source + parser; re-running the sink is idempotent."""
    import os

    docs = io.load_table(spark, SF_DIR, "documents").limit(40).select(
        "doc_id", "text",
        F.concat(F.lit("https://e.x/"), F.col("doc_id")).alias("url"),
        (F.col("doc_id") % 4).alias("file_id"))
    files = warc.assemble_warc_files(
        warc.build_warc_records(docs), gzip_records="mixed")
    out = str(tmp_path / "shards")
    warc.write_warc_files(files, out)
    warc.write_warc_files(files, out)  # idempotent re-run
    names = sorted(os.listdir(out))
    assert names == ["part-00000.warc", "part-00001.warc.gz",
                     "part-00002.warc", "part-00003.warc.gz"]
    bins = io.read_binary_files(spark, out).select(
        F.regexp_extract("path", r"part-(\d+)", 1).cast("long")
         .alias("file_id"),
        F.col("content"))
    parsed = warc.parse_warc(bins)
    back = {r["target_uri"]: r["payload_text"]
            for r in parsed.collect()}
    orig = {f"https://e.x/{r['doc_id']}": r["text"]
            for r in docs.collect()}
    assert back == orig


def test_aux_records_roundtrip_and_pair(spark):
    """build_warc_aux_records: request + metadata records interleave
    with responses in one file, survive assembly/parse, keep distinct
    record ids, and pair back to their response by target_uri."""
    docs = spark.createDataFrame(
        [(i, f"body {i}", f"https://e.x/{i}", 0) for i in range(3)],
        "doc_id long, text string, url string, file_id long")
    req = warc.build_warc_aux_records(
        docs.withColumn("p", F.concat(
            F.lit("GET /"), F.col("doc_id").cast("string"),
            F.lit(" HTTP/1.1\r\nHost: e.x\r\n\r\n"))),
        "request", "p",
        content_type="application/http;msgtype=request")
    meta = warc.build_warc_aux_records(
        docs.withColumn("p", F.concat(
            F.lit("fetchTimeMs: "), F.col("doc_id").cast("string"),
            F.lit("\r\n"))),
        "metadata", "p")
    ordn = F.col("doc_id") * 4
    mixed = (req.select("file_id", ordn.alias("ord"), "record")
             .unionByName(warc.build_warc_records(docs)
                          .select("file_id", (ordn + 1).alias("ord"),
                                  "record"))
             .unionByName(meta.select("file_id", (ordn + 2).alias("ord"),
                                      "record")))
    parsed = warc.parse_warc(
        warc.assemble_warc_files(mixed, order_col="ord")).collect()
    # 9 records, in crawl order per doc, all ids distinct
    assert [r["warc_type"] for r in parsed] \
        == ["request", "response", "metadata"] * 3
    assert len({r["record_id"] for r in parsed}) == 9
    by_uri = {}
    for r in parsed:
        by_uri.setdefault(r["target_uri"], []).append(r)
    for i in range(3):
        recs = {r["warc_type"]: r for r in by_uri[f"https://e.x/{i}"]}
        assert recs["response"]["http_status"] == 200
        assert recs["response"]["payload"] == f"body {i}".encode()
        assert recs["request"]["payload"].startswith(
            f"GET /{i} HTTP/1.1".encode())
        # warc-fields metadata decodes to a text view for downstream
        # regexp extraction
        assert recs["metadata"]["payload_text"] == f"fetchTimeMs: {i}\r\n"


def test_build_records_rejects_null_inputs_loudly(spark):
    """A NULL url or payload must fail the BUILD fast with a named
    message — not null-propagate into a NULL record that crashes file
    assembly later with an opaque AttributeError. (The row-granularity
    junk policy covers the parser of foreign bytes; serializing our own
    corpus with a NULL key is upstream corruption.)"""
    import pytest
    from pyspark.errors import SparkRuntimeException

    null_url = spark.createDataFrame(
        [(0, "body", "https://e.x/0", 0), (1, "body", None, 0)],
        "doc_id long, text string, url string, file_id long")
    with pytest.raises(SparkRuntimeException,
                       match=r"build_warc_records: NULL url"):
        warc.assemble_warc_files(warc.build_warc_records(null_url)) \
            .collect()
    null_payload = spark.createDataFrame(
        [(0, None, "https://e.x/0", 0)],
        "doc_id long, text string, url string, file_id long")
    with pytest.raises(SparkRuntimeException,
                       match=r"build_warc_records: NULL payload"):
        warc.build_warc_records(null_payload).select("record").collect()
    # non-null inputs are untouched by the guard
    ok = spark.createDataFrame(
        [(0, "", "https://e.x/0", 0)],  # empty payload is legal
        "doc_id long, text string, url string, file_id long")
    rows = warc.parse_warc(
        warc.assemble_warc_files(warc.build_warc_records(ok))).collect()
    assert len(rows) == 1 and rows[0]["payload"] == b""


def test_read_records_at_random_access(spark):
    """warc.read_records_at: fetches EXACTLY the requested
    (file_id, offset) records — plain shards by direct slice, gzip
    shards through the decompressed-offset convention — a bogus offset
    lands one visible 'invalid' row (junk policy, never a task
    failure), and a shard with no lookups is pruned by the inner join
    before its bytes are ever parsed."""
    import gzip

    from pyspark.sql import functions as F

    from clif_spark import warc

    plain = _fixture_file()
    # offsets of the four records in the fixture, in order
    offs, pos = [], 0
    while pos < len(plain):
        offs.append(pos)
        hdr_end = plain.index(b"\r\n\r\n", pos)
        ln = int([h for h in plain[pos:hdr_end].split(b"\r\n")
                  if h.lower().startswith(b"content-length:")][0]
                 .split(b":")[1])
        pos = hdr_end + 4 + ln + 4
    gz = b"".join(gzip.compress(plain[offs[i]:(offs + [len(plain)])[i + 1]],
                                mtime=0) for i in range(len(offs)))
    files = spark.createDataFrame(
        [(0, bytearray(plain)), (1, bytearray(gz)),
         (2, bytearray(plain))],
        "file_id long, content binary")
    lookups = spark.createDataFrame(
        [(0, offs[2]), (1, offs[2]), (0, 7),   # 7 = mid-record junk
         (0, 10_000_000)],                     # beyond EOF
        "file_id long, record_offset long")
    out = warc.read_records_at(files, lookups).collect()
    by = {(r.file_id, r.record_offset): r for r in out}
    assert len(out) == 4
    assert by[(0, 10_000_000)].warc_type == "invalid"
    assert by[(0, offs[2])].warc_type == "response"
    assert by[(0, offs[2])].payload_text == "hello <b>world</b>"
    # same record through the gzip shard: offsets are into the
    # DECOMPRESSED stream, so the plain-file offset addresses it
    assert by[(1, offs[2])].warc_type == "response"
    assert by[(1, offs[2])].target_uri == "https://example.org/a"
    assert by[(0, 7)].warc_type == "invalid"
    # file 2 had no lookups -> pruned before parse (inner join)
    assert not [r for r in out if r.file_id == 2]


def test_read_records_at_boundary_offset_and_bounded_growth(spark):
    """ADVICE r12 pins: (1) a stale offset landing on the inter-record
    CRLF boundary is an 'invalid' row — the parser's leading-CRLF skip
    must NOT return the next record rebased to the stale offset; (2) gz
    decompression is bounded to the highest offset plus a tail, with a
    growth loop for records longer than the tail (here a 2.5 MiB
    payload against the 1 MiB initial tail)."""
    big = (b"0123456789abcdef" * (160 * 1024)) + b"!"  # 2.5 MiB + 1
    r0 = _rec("resource",
              {"WARC-Record-ID": "<urn:uuid:eee>",
               "WARC-Target-URI": "https://example.org/small"},
              b"tiny")
    r1 = _rec("resource",
              {"WARC-Record-ID": "<urn:uuid:fff>",
               "WARC-Target-URI": "https://example.org/big"},
              big)
    plain = r0 + r1
    files = spark.createDataFrame(
        [(0, bytearray(gzip.compress(plain, mtime=0)))],
        "file_id long, content binary")
    lookups = spark.createDataFrame(
        [(0, 0), (0, len(r0)), (0, len(r0) - 2)],  # -2 = CRLF boundary
        "file_id long, record_offset long")
    out = {r.record_offset: r
           for r in warc.read_records_at(files, lookups).collect()}
    assert out[0].warc_type == "resource"
    assert out[0].payload == bytearray(b"tiny")
    # the big record's block ends past offset + 1 MiB: only the growth
    # loop can complete it
    assert out[len(r0)].warc_type == "resource"
    assert bytes(out[len(r0)].payload) == big
    # boundary offset: invalid, NOT r1 rebased two bytes early
    assert out[len(r0) - 2].warc_type == "invalid"
    assert out[len(r0) - 2].target_uri is None


def test_member_spans_index_and_ranged_read(spark):
    """Compressed-member CDX convention: parse_warc_members reports
    each record's STORED byte span (gzip member on .warc.gz, record
    bytes on plain), its first 10 columns byte-match parse_warc, and
    read_records_at_members fetches a record from the span alone —
    slicing raw bytes, decompressing one member, never the prefix. A
    torn span lands an invalid row."""
    plain = _fixture_file()
    # per-record gzip members (the Common Crawl layout)
    offs, pos = [], 0
    while pos < len(plain):
        offs.append(pos)
        hdr_end = plain.index(b"\r\n\r\n", pos)
        ln = int([h for h in plain[pos:hdr_end].split(b"\r\n")
                  if h.lower().startswith(b"content-length:")][0]
                 .split(b":")[1])
        pos = hdr_end + 4 + ln + 4
    bounds = offs + [len(plain)]
    gz = b"".join(gzip.compress(plain[bounds[i]:bounds[i + 1]], mtime=0)
                  for i in range(len(offs)))
    files = spark.createDataFrame(
        [(0, bytearray(plain)), (1, bytearray(gz))],
        "file_id long, content binary")

    members = warc.parse_warc_members(files).collect()
    base = {(r.file_id, r.record_offset): r
            for r in warc.parse_warc(files).collect()}
    assert len(members) == 2 * len(offs)
    for r in members:
        b = base[(r.file_id, r.record_offset)]
        assert (r.warc_type, r.record_id, r.target_uri, r.payload) == \
               (b.warc_type, b.record_id, b.target_uri, b.payload)
    # gz spans decompress to exactly one record's bytes; plain spans
    # ARE the record's bytes
    for r in members:
        raw = gz if r.file_id == 1 else plain
        chunk = bytes(raw[r.member_offset:
                          r.member_offset + r.member_length])
        data = gzip.decompress(chunk) if r.file_id == 1 else chunk
        assert data.startswith(b"WARC/")
    # decompressed record_offset convention matches parse_warc on the
    # gz shard too (the equality above keyed on it already); now the
    # ranged READ: fetch the response record from both shards plus one
    # torn span
    resp = [r for r in members if r.warc_type == "response"]
    lookups = spark.createDataFrame(
        [(r.file_id, r.member_offset, r.member_length) for r in resp]
        + [(1, 3, 11)],  # torn span: mid-member slice
        "file_id long, member_offset long, member_length long")
    got = {(r.file_id, r.member_offset): r
           for r in warc.read_records_at_members(files, lookups)
                         .collect()}
    for r in resp:
        g = got[(r.file_id, r.member_offset)]
        assert g.warc_type == "response"
        assert g.payload == r.payload
        assert g.target_uri == "https://example.org/a"
        assert g.member_length == r.member_length
    assert got[(1, 3)].warc_type == "invalid"


def test_member_parse_corrupt_tail_junk_policy(spark):
    """A shard whose gzip stream is torn mid-member must not kill the
    task: every member before the damage parses normally and the
    unreadable remainder lands ONE visible invalid row spanning its
    compressed bytes (a member walk cannot resync past a corrupt
    deflate stream)."""
    plain = _fixture_file()
    # split at the first record boundary -> two members, then tear the
    # second member's bytes
    hdr_end = plain.index(b"\r\n\r\n")
    ln = int([h for h in plain[:hdr_end].split(b"\r\n")
              if h.lower().startswith(b"content-length:")][0]
             .split(b":")[1])
    cut = hdr_end + 4 + ln + 4
    m1 = gzip.compress(plain[:cut], mtime=0)
    m2 = bytearray(gzip.compress(plain[cut:], mtime=0))
    m2[12:20] = b"\x00" * 8  # corrupt the deflate body
    files = spark.createDataFrame(
        [(0, bytearray(m1) + m2)], "file_id long, content binary")
    rows = warc.parse_warc_members(files).collect()
    ok = [r for r in rows if r.warc_type != "invalid"]
    bad = [r for r in rows if r.warc_type == "invalid"]
    assert len(ok) == 1 and ok[0].warc_type == "warcinfo"
    assert ok[0].member_offset == 0 and ok[0].member_length == len(m1)
    assert len(bad) == 1
    assert bad[0].member_offset == len(m1)
    assert bad[0].member_length == len(m2)


def test_revisit_record_roundtrip_carries_pairing_headers(spark):
    """build_warc_revisit_records emits a spec-shaped revisit record —
    no content block, identical-payload-digest profile, the pairing
    headers (WARC-Payload-Digest, WARC-Refers-To-Target-URI) — and the
    parser surfaces both headers as columns so a reader can resolve
    the referred capture through the CDX index without the payload."""
    from clif_spark import warc

    rows = spark.createDataFrame(
        [(1, "https://a.example/x", "d41d8cd98f00b204e9800998ecf8427e",
          "urn:uuid:12345678-1234-1234-1234-123456789abc")],
        "doc_id long, url string, digest string, prev_id string")
    recs = warc.build_warc_revisit_records(
        rows, refers_to_id_col="prev_id",
        warc_date="2026-02-01T00:00:00Z")
    files = warc.assemble_warc_files(
        recs.withColumn("file_id", F.lit(0).cast("long")))
    got = warc.parse_warc(files).collect()
    assert len(got) == 1
    r = got[0]
    assert r.warc_type == "revisit"
    assert r.target_uri == "https://a.example/x"
    assert r.payload == b""                       # no stored payload
    assert r.payload_digest == \
        "md5:d41d8cd98f00b204e9800998ecf8427e"
    assert r.refers_to_uri == "https://a.example/x"
    # the raw bytes carry the profile and the referred record id
    raw = files.collect()[0].content
    assert b"WARC-Profile: http://netpreserve.org/warc/1.1/revisit/" \
           b"identical-payload-digest" in raw
    assert b"WARC-Refers-To: <urn:uuid:12345678-1234-1234-1234-" \
           b"123456789abc>" in raw
    assert b"Content-Length: 0" in raw
    # a response record in the same shard still parses with NULL
    # pairing columns
    resp = warc.build_warc_records(
        spark.createDataFrame([(2, "https://b.example/y", "hi")],
                              "doc_id long, url string, text string"))
    both = warc.assemble_warc_files(
        recs.select("doc_id", "record")
            .unionByName(resp.select("doc_id", "record"))
            .withColumn("file_id", F.lit(0).cast("long")))
    by = {r.warc_type: r for r in warc.parse_warc(both).collect()}
    assert by["response"].payload_digest is None
    assert by["response"].refers_to_uri is None


def test_build_records_reject_header_injection_bytes(spark):
    """Every value a builder interpolates into a WARC header LINE
    (url in all three builders; digest and refers-to id in the
    revisit builder) must be CR/LF-free — a line break in one row
    injects headers and breaks record framing for the whole shard,
    so the family fails loud at build (ADVICE r15), same policy as
    the NULL guards. Length-framed payloads keep their right to
    carry any bytes."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    bad_url = spark.createDataFrame(
        [(0, "body", "https://e.x/0\r\nWARC-Type: evil", 0)],
        "doc_id long, text string, url string, file_id long")
    with pytest.raises(SparkRuntimeException,
                       match=r"build_warc_records: CR/LF in url"):
        warc.build_warc_records(bad_url).select("record").collect()
    with pytest.raises(SparkRuntimeException,
                       match=r"build_warc_aux_records: CR/LF in url"):
        warc.build_warc_aux_records(
            bad_url, "metadata", "text").select("record").collect()
    rev = "doc_id long, url string, digest string, prev_id string"
    with pytest.raises(
            SparkRuntimeException,
            match=r"build_warc_revisit_records: CR/LF in digest"):
        warc.build_warc_revisit_records(spark.createDataFrame(
            [(1, "https://a.example/x", "abc\ndef", "urn:x")], rev),
            refers_to_id_col="prev_id").select("record").collect()
    with pytest.raises(
            SparkRuntimeException,
            match=r"build_warc_revisit_records: NULL or CR/LF "
                  r"refers-to id"):
        warc.build_warc_revisit_records(spark.createDataFrame(
            [(1, "https://a.example/x", "abcdef", None)], rev),
            refers_to_id_col="prev_id").select("record").collect()
    # payloads are length-framed: CR/LF bytes inside them are legal
    # and roundtrip exactly
    ok = spark.createDataFrame(
        [(0, "line1\r\nline2\nline3", "https://e.x/0", 0)],
        "doc_id long, text string, url string, file_id long")
    got = warc.parse_warc(
        warc.assemble_warc_files(warc.build_warc_records(ok))).collect()
    assert got[0].payload == b"line1\r\nline2\nline3"
