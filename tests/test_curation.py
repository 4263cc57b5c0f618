"""Operator-level invariants for clif_spark.curation (the oracle gate
covers value equality; these pin the semantic contracts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clif_spark import curation, io

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return io.load_table(spark, SF_DIR, "documents")


def test_redact_pii_masks_everything(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@ex-ample.org and call +44-123-4567 now"),
         (2, "no pii here")],
        ["id", "text"])
    out = df.select("id", curation.redact_pii(F.col("text")).alias("t"),
                    *[c.alias(n) for c, n in
                      zip(curation.pii_counts(F.col("text")),
                          ["n_emails", "n_phones"])]).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["t"] == "mail [EMAIL] and call [PHONE] now"
    assert (by_id[1]["n_emails"], by_id[1]["n_phones"]) == (1, 1)
    assert (by_id[2]["n_emails"], by_id[2]["n_phones"]) == (0, 0)


def test_tfidf_ranks_descending_within_doc(docs):
    rows = curation.tfidf_top_terms(docs.limit(50), k=3).collect()
    per_doc: dict = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append((r["rank"], r["tfidf"]))
    for doc, rr in per_doc.items():
        rr.sort()
        assert [x[0] for x in rr] == list(range(1, len(rr) + 1))
        scores = [x[1] for x in rr]
        assert scores == sorted(scores, reverse=True)
        assert len(rr) <= 3


def test_contamination_finds_planted_overlap(spark, docs):
    eval_df = docs.filter(F.col("doc_id") < 5).select("doc_id", "text")
    # corpus doc 100 = eval doc 0's text verbatim -> must collide heavily
    corpus = (docs.filter(F.col("doc_id") == 0)
                  .select(F.lit(100).alias("doc_id"), "text"))
    out = curation.contamination_overlap(corpus, eval_df, n=5).collect()
    assert len(out) == 1 and out[0]["n_shared"] >= 10


def test_pack_sequences_conserves_tokens(docs):
    budget = 256
    packed = curation.pack_sequences(docs, budget=budget, shards=4)
    rows = packed.collect()
    total_packed = sum(r["bin_tokens"] for r in rows)
    total = docs.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))).first()[0]
    assert total_packed == total
    # bins are dense 0..max per shard (greedy in-order packing never skips)
    per_shard: dict = {}
    for r in rows:
        per_shard.setdefault(r["shard"], []).append(r["bin"])
    for shard, bins in per_shard.items():
        assert sorted(bins) == list(range(len(bins)))
    # chunk-straddle bound: a bin overshoots the budget by less than the
    # largest straddling doc, and only the shard's last bin may undershoot
    max_doc = docs.select(
        F.max(F.size(F.split(F.trim("text"), r"\s+")))).first()[0]
    for shard, bins in per_shard.items():
        by_bin = {r["bin"]: r["bin_tokens"] for r in rows
                  if r["shard"] == shard}
        for b, tok in by_bin.items():
            if b != max(bins):
                assert tok >= 1
            assert tok < budget + max_doc


def test_quantize_int8_error_bound(spark):
    emb = io.load_table(spark, SF_DIR, "embeddings")
    rows = curation.quantize_int8(emb).collect()
    assert len(rows) == emb.count()
    for r in rows:
        # |q| <= ceil(127.5) per element, 64 dims
        assert abs(r["checksum"]) <= 128 * 64
        # half-step reconstruction bound: err <= scale/2 (+ rounding slack)
        assert r["max_err"] <= r["amax"] / 127.0 * 0.5 + 1e-6
