"""Multimodal plumbing: the decode stub and its DuckDB oracle must agree
byte-for-byte even on non-ASCII text, where the first UTF-8 byte of the
payload differs from the first codepoint (the trap ADVICE r3 flagged)."""

from __future__ import annotations

import duckdb

from clif_spark import multimodal
from clif_spark.queries import collect_registry


def _oracle_rows(sql: str, docs: list[tuple[int, str]]):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    try:
        return sorted(tuple(r) for r in con.execute(sql).fetchall())
    finally:
        con.close()


# 'Ω' leads with UTF-8 byte 0xCE (206): codepoint math would give 937-based
# width/height and 'jpeg'/'png' flipped. '' exercises the empty-payload guard.
DOCS = [(1, "Ωmega leads non-ascii"), (2, "plain ascii"), (3, ""),
        (4, "éclair")]


def test_decode_meta_stub_matches_oracle_on_non_ascii(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = multimodal.decode_image_meta(multimodal.attach_binary_payload(df))
    got = sorted(tuple(r) for r in out.collect())
    want = _oracle_rows(collect_registry()["mm_decode_meta"].oracle, DOCS)
    assert got == want
    # spot-pin the byte semantics: Ω → 0xCE=206 (even → png, height 207)
    row = {r[0]: r for r in got}[1]
    assert row[2] == "png" and row[4] == 206 % 480 + 1


def test_resize_meta_stub_matches_oracle_on_non_ascii(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    out = multimodal.resize_image_meta(multimodal.attach_binary_payload(df))
    got = sorted(tuple(r) for r in out.collect())
    want = _oracle_rows(collect_registry()["mm_resize_meta"].oracle, DOCS)
    assert got == want
