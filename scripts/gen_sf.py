"""Generate a synthetic scale-factor directory shaped like the driver's
testdata (TESTDATA.md: TPC-H-ish star schema + events/documents/embeddings),
for bench datapoints at SFs the driver does not ship (e.g. sf1).

Matches the shipped tables' schemas, key ranges, category vocabularies and
row-count ratios (measured off sf0.1); it is NOT the driver's generator, so
value-level results differ — use it for throughput/scaling measurements
(BASELINE.md sf1 row), never for the correctness gate.

Usage: python scripts/gen_sf.py <sf> <out_dir>   e.g. 1 /tmp/clif_sf1
"""

from __future__ import annotations

import json
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
DOC_WORDS = ("batch part spark line column order small sort fast value scan "
             "a hash slow group query big filter key window row table stream "
             "merge data agg vector join shuffle read write plan stage task "
             "disk cache cpu cost").split()
LANGS = ["en", "es", "de", "fr", "it"]

DAY_US = 86_400_000_000


def _ts_col(us: np.ndarray) -> pa.Array:
    return pa.Array.from_pandas(us).cast(pa.timestamp("us"))


def write(out: str, name: str, table: pa.Table) -> None:
    # Target ~32 MB row groups (by in-memory size estimate): a 100 TB
    # corpus arrives as many splittable files/groups, and a single giant
    # row group caps BOTH engines' scan parallelism at one task (the
    # driver's own sf0.1 fixtures have exactly this shape; our scale
    # datapoints should not inherit it). pyarrow's default 1M-row groups
    # left sf10 documents as ONE 58 MB group.
    rows = table.num_rows
    bpr = max(1, table.nbytes // max(1, rows))
    rg = max(10_000, min(1_000_000, (32 << 20) // bpr))
    pq.write_table(table, f"{out}/{name}.parquet", row_group_size=rg)
    print(name, rows, "rg_rows", rg)


def main(sf: float, out: str) -> None:
    import os
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS}))
    write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))
    write(out, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)])}))
    write(out, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2)}))
    adj = ["large", "hot", "blue", "red", "dim", "cold", "new", "old"]
    noun = ["ring", "bolt", "case", "disk", "gear", "plate", "wire", "tube"]
    write(out, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [f"{adj[i % 8]} {noun[(i // 8) % 8]}" for i in range(n_part)],
        "p_brand": [f"Brand#{i % 25}" for i in range(n_part)],
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 5, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 2000, n_part), 2)}))

    base_1995 = np.int64(788918400) * 1_000_000  # 1995-01-01 UTC in micros
    odate = base_1995 + rng.integers(0, 2404, n_ord) * DAY_US
    write(out, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "F", "P"])[
            rng.choice(3, n_ord, p=[0.49, 0.49, 0.02])]),
        "o_totalprice": np.round(rng.uniform(1000, 400000, n_ord), 2),
        "o_orderdate": _ts_col(odate),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[
            rng.integers(0, 5, n_ord)])}))

    li_order = rng.integers(0, n_ord, n_li)
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    price = np.round(rng.uniform(900.0, 105000.0, n_li), 2)
    write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(li_order, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": price,
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[
            rng.choice(3, n_li, p=[0.25, 0.5, 0.25])]),
        "l_linestatus": pa.array(np.array(["O", "F"])[
            rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_col(odate[li_order] + rng.integers(1, 95, n_li) * DAY_US)}))

    base_2024 = np.int64(1704067200) * 1_000_000  # 2024-01-01 UTC
    ev_ts = base_2024 + rng.integers(0, 30 * DAY_US, n_ev, dtype=np.int64)
    write(out, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": _ts_col(ev_ts),
        "user_id": pa.array(rng.integers(0, int(15_000 * sf), n_ev), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[
            rng.choice(5, n_ev, p=[0.4, 0.35, 0.1, 0.05, 0.1])]),
        "value": np.round(rng.exponential(60.0, n_ev).clip(0, 600), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)]}))

    words = np.array(DOC_WORDS)
    lens = rng.integers(8, 101, n_doc)
    texts = [" ".join(words[rng.integers(0, len(words), ln)]) for ln in lens]
    write(out, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.integers(0, 5, n_doc)]),
        "source": [f"src_{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

    labels = rng.integers(0, 10, n_emb)
    centers = rng.normal(0, 1, (10, 64))
    vecs = (centers[labels] + rng.normal(0, 0.6, (n_emb, 64))).astype(np.float32)
    write(out, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())}))


if __name__ == "__main__":
    main(float(sys.argv[1]), sys.argv[2])
