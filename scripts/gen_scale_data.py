"""Generate driver-shaped synthetic tables at an arbitrary scale factor.

The driver's testdata (TESTDATA.md) stops at sf0.1; the fixed-cost
amortization claim in SCALING.md needs at least one decade beyond that.
This generator reproduces the driver tables' SHAPES — row-count ratios
(TPC-H proportions), column domains, categorical frequencies, text
vocabulary/length distribution, embedding geometry, dup-injection rate —
by profiling /root/testdata/sf0.1 empirically and scaling row counts
linearly. It does NOT reproduce the driver's seed/values (irrelevant for
scaling curves; correctness stays pinned to the driver's own dirs).

Usage: python scripts/gen_scale_data.py <mult> <outdir> [tables]
  e.g. python scripts/gen_scale_data.py 10 /root/repo/testdata_sf1
       python scripts/gen_scale_data.py 1000 /root/repo/testdata_sf100emb \
           region,nation,embeddings
Writes region nation customer supplier part orders lineitem events
documents embeddings as single parquet files (timestamp[us], matching
the driver's physical schema). The optional comma-separated [tables]
arg restricts output — the embeddings-only mode exists because the ANN
operators scale with the embeddings table alone, so a crossover point
at mult=1000 doesn't need a 600M-row lineitem alongside it.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"
# sf0.1 row counts (verified); everything scales linearly except the
# fixed region/nation dimensions.
COUNTS = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "lineitem": 600_000,  # derived from orders × lines-per-order
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
}
EVENT_USERS = 1_500  # scales linearly too (150 at sf0.01)

DAY_US = 86_400_000_000


def _cat(con, table, col):
    """Empirical (values, probabilities) of a categorical column."""
    rows = con.sql(
        f"SELECT {col}, COUNT(*) FROM '{BASE}/{table}.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    vals = np.array([r[0] for r in rows], dtype=object)
    p = np.array([r[1] for r in rows], dtype=float)
    return vals, p / p.sum()


def _pick(rng, vals, p, n):
    return vals[rng.choice(len(vals), size=n, p=p)]


def main() -> None:
    mult = float(sys.argv[1])
    outdir = sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(4242)
    con = duckdb.connect()

    def wanted(name):
        return only is None or name in only

    def write(name, table):
        pq.write_table(table, f"{outdir}/{name}.parquet")
        print(name, table.num_rows, flush=True)

    # -- fixed dims (copied verbatim) --
    for name in ("region", "nation"):
        if wanted(name):
            write(name, pq.read_table(f"{BASE}/{name}.parquet"))

    n_cust = int(COUNTS["customer"] * mult)
    n_supp = int(COUNTS["supplier"] * mult)
    n_part = int(COUNTS["part"] * mult)
    n_ord = int(COUNTS["orders"] * mult)

    # -- customer --
    if wanted("customer"):
        _gen_customer(con, rng, write, n_cust)
    if wanted("supplier"):
        _gen_supplier(rng, write, n_supp)
    if wanted("part"):
        _gen_part(con, rng, write, n_part)
    if wanted("orders") or wanted("lineitem"):
        _gen_orders_lineitem(
            con, rng, write, n_ord, n_cust, n_supp, n_part, wanted
        )
    if wanted("events"):
        _gen_events(con, rng, write, mult)
    if wanted("documents"):
        _gen_documents(con, rng, write, mult)
    if wanted("embeddings"):
        _gen_embeddings(rng, write, mult)


def _gen_customer(con, rng, write, n_cust):
    seg_v, seg_p = _cat(con, "customer", "c_mktsegment")
    write(
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": pa.array(
                    rng.integers(0, 25, n_cust), pa.int32()
                ),
                "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
                "c_mktsegment": _pick(rng, seg_v, seg_p, n_cust).tolist(),
            }
        ),
    )


def _gen_supplier(rng, write, n_supp):
    write(
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": pa.array(
                    rng.integers(0, 25, n_supp), pa.int32()
                ),
                "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
            }
        ),
    )


def _gen_part(con, rng, write, n_part):
    name_v, name_p = _cat(con, "part", "p_name")
    brand_v, brand_p = _cat(con, "part", "p_brand")
    type_v, type_p = _cat(con, "part", "p_type")
    write(
        "part",
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part), pa.int64()),
                "p_name": _pick(rng, name_v, name_p, n_part).tolist(),
                "p_brand": _pick(rng, brand_v, brand_p, n_part).tolist(),
                "p_type": _pick(rng, type_v, type_p, n_part).tolist(),
                "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
                "p_retailprice": np.round(
                    900.0 + (np.arange(n_part) % 1000) / 10.0, 2
                ),
            }
        ),
    )


def _gen_orders_lineitem(con, rng, write, n_ord, n_cust, n_supp, n_part, wanted):
    st_v, st_p = _cat(con, "orders", "o_orderstatus")
    pr_v, pr_p = _cat(con, "orders", "o_orderpriority")
    d0 = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    span_days = int(
        (np.datetime64("2001-08-01") - np.datetime64("1995-01-01"))
        / np.timedelta64(1, "D")
    )
    o_days = rng.integers(0, span_days + 1, n_ord)
    o_date_us = d0 + o_days * DAY_US
    if wanted("orders"):
        write(
            "orders",
            pa.table(
                {
                    "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
                    "o_custkey": pa.array(
                        rng.integers(0, n_cust, n_ord), pa.int64()
                    ),
                    "o_orderstatus": _pick(rng, st_v, st_p, n_ord).tolist(),
                    "o_totalprice": np.round(
                        rng.uniform(1000, 500000, n_ord), 2
                    ),
                    "o_orderdate": pa.array(o_date_us, pa.timestamp("us")),
                    "o_orderpriority": _pick(
                        rng, pr_v, pr_p, n_ord
                    ).tolist(),
                }
            ),
        )
    if not wanted("lineitem"):
        return

    # -- lineitem: 1..7 lines per order (driver avg 4.08) --
    lines = rng.integers(1, 8, n_ord)
    lkey = np.repeat(np.arange(n_ord), lines)
    n_li = len(lkey)
    lnum = np.concatenate([np.arange(1, k + 1) for k in lines]).astype(np.int32)
    ship_us = np.repeat(o_date_us, lines) + rng.integers(
        1, 96, n_li
    ) * DAY_US
    rf_v, rf_p = _cat(con, "lineitem", "l_returnflag")
    ls_v, ls_p = _cat(con, "lineitem", "l_linestatus")
    write(
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(lkey, pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
                "l_linenumber": pa.array(lnum, pa.int32()),
                "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
                "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
                "l_discount": np.round(rng.uniform(0, 0.10, n_li), 2),
                "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
                "l_returnflag": _pick(rng, rf_v, rf_p, n_li).tolist(),
                "l_linestatus": _pick(rng, ls_v, ls_p, n_li).tolist(),
                "l_shipdate": pa.array(ship_us, pa.timestamp("us")),
            }
        ),
    )


def _gen_events(con, rng, write, mult):
    # -- events: uniform over Jan 2024, exponential value, json props --
    n_ev = int(COUNTS["events"] * mult)
    n_users = int(EVENT_USERS * mult)
    et_v, et_p = _cat(con, "events", "event_type")
    t0 = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    t1 = np.datetime64("2024-01-31").astype("datetime64[us]").astype(np.int64)
    ks = rng.integers(0, 100, n_ev)
    write(
        "events",
        pa.table(
            {
                "event_id": pa.array(np.arange(n_ev), pa.int64()),
                "ts": pa.array(
                    np.sort(rng.integers(t0, t1, n_ev)), pa.timestamp("us")
                ),
                "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
                "event_type": _pick(rng, et_v, et_p, n_ev).tolist(),
                "value": rng.exponential(50.0, n_ev),
                "props": [f'{{"k": {k}}}' for k in ks],
            }
        ),
    )


def _gen_documents(con, rng, write, mult):
    # -- documents: empirical unigram vocab, uniform 10..100 tokens,
    #    ~0.16% exact-dup injection (matches 4992/5000 distinct) --
    n_doc = int(COUNTS["documents"] * mult)
    toks = con.sql(
        f"SELECT tok, COUNT(*) FROM (SELECT UNNEST(string_split(text, ' ')) tok "
        f"FROM '{BASE}/documents.parquet') GROUP BY 1 ORDER BY 1"
    ).fetchall()
    vocab = np.array([t for t, _ in toks], dtype=object)
    w = np.array([c for _, c in toks], dtype=float)
    w /= w.sum()
    lang_v, lang_p = _cat(con, "documents", "lang")
    src_v, src_p = _cat(con, "documents", "source")
    lens = rng.integers(10, 101, n_doc)
    texts: list[str] = []
    # Chunked + vectorized (round-10: the per-row rng.choice loop was
    # fine at mult<=100 but not for the 5M-doc third-decade fixture):
    # one choice() draw per chunk, per-doc slices via cumulative
    # offsets. Same distribution as the loop — empirical-unigram
    # tokens, uniform 10..100 lengths, ~0.16% exact-dup injection from
    # the already-generated prefix — different rng stream (fixtures
    # are growth-curve substrates, not value-pinned; correctness stays
    # on the driver's own dirs).
    chunk = 200_000
    for start in range(0, n_doc, chunk):
        ln = lens[start : start + chunk]
        offs = np.concatenate([[0], np.cumsum(ln)])
        toks = vocab[rng.choice(len(vocab), size=int(offs[-1]), p=w)]
        ctexts = [
            " ".join(toks[offs[j] : offs[j + 1]]) for j in range(len(ln))
        ]
        dup = np.nonzero(rng.random(len(ln)) < 0.0016)[0]
        for j in dup:
            gi = start + int(j)
            if gi == 0:
                continue
            src = int(rng.integers(0, gi))
            ctexts[j] = texts[src] if src < start else ctexts[src - start]
        texts.extend(ctexts)
    write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_doc), pa.int64()),
                "text": texts,
                "lang": _pick(rng, lang_v, lang_p, n_doc).tolist(),
                "source": _pick(rng, src_v, src_p, n_doc).tolist(),
                "n_chars": pa.array(
                    np.array([len(t) for t in texts]), pa.int64()
                ),
            }
        ),
    )


def _gen_embeddings(rng, write, mult):
    # -- embeddings: 64-dim unit vectors, 10 weak clusters (centroid norm
    #    ~0.07, within-dim std 0.125 — the sf0.1 geometry) --
    n_emb = int(COUNTS["embeddings"] * mult)
    labels = rng.integers(0, 10, n_emb)
    cents = rng.normal(0, 0.07 / 8.0, (10, 64))
    V = cents[labels] + rng.normal(0, 0.125, (n_emb, 64))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    V = V.astype(np.float32)
    write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_emb), pa.int64()),
                "embedding": pa.array(
                    list(V), pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
    )


if __name__ == "__main__":
    main()
