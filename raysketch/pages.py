"""Common-Crawl-style pages table, derived deterministically from the driver
testdata (BASELINE.json input_hint schema: url, warc_ts, html, text, lang).

The reference's corpus is Ethereum addresses fetched over the network
(/root/reference/bench-data/bench_data.py); in this sandbox the pages table
is instead a pure deterministic function of the sf_dir parquet tables
(documents + orders), expressed IDENTICALLY in Ray (pages_dataset) and in
DuckDB SQL (PAGES_SQL) so the driver's oracle comparison covers the
derivation end-to-end.  ~5% exact url duplicates are injected (orders with
o_orderkey % 20 == 0 appear twice) to exercise the dedup contract
(reference src/bench.zig:258-297); hosts from orders follow a skewed
floor(sqrt(uniform)) distribution to exercise salted pre-aggregation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

_EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us")


def _docs_to_pages(batch: pa.Table) -> pa.Table:
    doc_id = batch["doc_id"]
    doc_id_s = pc.cast(doc_id, pa.string())
    url = pc.binary_join_element_wise(
        "https://", batch["source"], ".example.org/", batch["lang"], "/d",
        doc_id_s, "")
    days = np.asarray(doc_id) % 365
    ts = pa.array(_EPOCH_2024 + days.astype("timedelta64[D]").astype(
        "timedelta64[us]"), type=pa.timestamp("us"))
    html = pc.cast(pc.binary_join_element_wise(
        "<html><body>", batch["text"], "</body></html>", ""), pa.binary())
    return pa.table({
        "url": url, "warc_ts": ts, "html": html,
        "text": batch["text"], "lang": batch["lang"],
    }).cast(PAGES_SCHEMA)


def _orders_to_pages(batch: pa.Table) -> pa.Table:
    ck = np.asarray(batch["o_custkey"])
    host_id = np.floor(np.sqrt((ck % 10000).astype(np.float64))).astype(np.int64)
    ok_s = pc.cast(batch["o_orderkey"], pa.string())
    url = pc.binary_join_element_wise(
        "https://h", pa.array(host_id.astype(str)), ".shop.example.com/o/",
        ok_s, "")
    html = pc.cast(pc.binary_join_element_wise(
        "<html>", batch["o_orderpriority"], "</html>", ""), pa.binary())
    text = pc.binary_join_element_wise(
        batch["o_orderstatus"], " ", batch["o_orderpriority"], "")
    return pa.table({
        "url": url,
        "warc_ts": pc.cast(batch["o_orderdate"], pa.timestamp("us")),
        "html": html, "text": text,
        "lang": pa.array(["en"] * len(batch)),
    }).cast(PAGES_SCHEMA)


_ORDERS_COLS = ["o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus",
                "o_orderpriority"]


def _orders_dup_pages(t: pa.Table) -> pa.Table:
    keep = (np.asarray(t["o_orderkey"]) % 20) == 0
    return _orders_to_pages(t.filter(pa.array(keep)))


def pages_dataset(sf_dir: str):
    """Pages table as a streaming ray.data.Dataset (documents + orders +
    5% duplicate injection).  Column pruning happens at the parquet read;
    block counts are file-size-derived (read_parquet_sized) so the 3-way
    union doesn't explode into ~6x-cpu micro-blocks at small scale."""
    from raysketch.util import read_parquet_sized

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    ).map_batches(_docs_to_pages, batch_format="pyarrow")
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=_ORDERS_COLS,
    ).map_batches(_orders_to_pages, batch_format="pyarrow")
    dups = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=_ORDERS_COLS,
    ).map_batches(_orders_dup_pages, batch_format="pyarrow")
    return docs.union(orders).union(dups)


# DuckDB subquery producing the identical table (driver pre-registers the
# raw parquet tables as views named documents/orders/...).
PAGES_SQL = """(
  SELECT
    'https://' || source || '.example.org/' || lang || '/d'
        || CAST(doc_id AS VARCHAR) AS url,
    TIMESTAMP '2024-01-01 00:00:00' + (doc_id % 365) * INTERVAL 1 DAY AS warc_ts,
    encode('<html><body>' || text || '</body></html>') AS html,
    text AS text,
    lang AS lang
  FROM documents
  UNION ALL
  SELECT
    'https://h' || CAST(CAST(FLOOR(SQRT(CAST(o_custkey % 10000 AS DOUBLE))) AS BIGINT) AS VARCHAR)
        || '.shop.example.com/o/' || CAST(o_orderkey AS VARCHAR) AS url,
    o_orderdate AS warc_ts,
    encode('<html>' || o_orderpriority || '</html>') AS html,
    o_orderstatus || ' ' || o_orderpriority AS text,
    'en' AS lang
  FROM orders
  UNION ALL
  SELECT
    'https://h' || CAST(CAST(FLOOR(SQRT(CAST(o_custkey % 10000 AS DOUBLE))) AS BIGINT) AS VARCHAR)
        || '.shop.example.com/o/' || CAST(o_orderkey AS VARCHAR) AS url,
    o_orderdate AS warc_ts,
    encode('<html>' || o_orderpriority || '</html>') AS html,
    o_orderstatus || ' ' || o_orderpriority AS text,
    'en' AS lang
  FROM orders WHERE o_orderkey % 20 = 0
)"""


def host_of(url_col) -> pa.Array:
    """host = substring between '://' and the next '/' (vectorized)."""
    parts = pc.split_pattern(url_col, "/")
    return pc.list_element(parts, 2)


HOST_SQL = "split_part(url, '/', 3)"
