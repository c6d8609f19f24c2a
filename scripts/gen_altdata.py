"""Generate an alternate-seed replica of the driver's synthetic tables.

The driver regenerates its parquet fixtures per round, so values (and
row counts) differ from the copies under /root/testdata — round 2's
`fn_math` hash FAIL was exactly a data-dependent divergence that the
local fixture happened not to contain.  This script produces the same
schemas / value grids (FIXTURES.md) from a different seed so the full
replica sweep (`scripts/driver_sim.py <out_dir>`) can flush out parity
bugs that only appear on data we have not seen.

Deliberately preserved invariants (the declared fixture contract):
unique primary keys, 2-dp price grids, hundredths discount/tax grids,
integral quantities, µs timestamps, no NULLs, 64-dim embeddings,
space-separated word-soup text.  Everything else (row counts, key
skew, date ranges' interior, correlations) is intentionally perturbed.

Usage: python scripts/gen_altdata.py [out_dir] [seed] [sf]
Defaults: /tmp/altdata/sf0.01  seed=4243  sf=0.01
"""

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/altdata/sf0.01"
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 4243
SF = float(sys.argv[3]) if len(sys.argv) > 3 else 0.01

rng = np.random.default_rng(SEED)
os.makedirs(OUT, exist_ok=True)

N_CUST = int(150_000 * SF)
N_SUPP = max(int(10_000 * SF), 10)
N_PART = int(200_000 * SF)
N_ORD = int(1_500_000 * SF)
N_EVT = int(1_000_000 * SF)
N_DOC = max(int(50_000 * SF), 100)
DIM = 64


def write(name: str, table: pa.Table) -> None:
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(f"{name}: {table.num_rows} rows")


def money(n: int, lo: float, hi: float) -> np.ndarray:
    # 2-dp doubles: nearest double to a cents value, same as the fixture.
    return np.round(rng.uniform(lo, hi, n), 2)


def us_ts(days_lo: str, days_hi: str, n: int, midnight: bool = True) -> pa.Array:
    lo = np.datetime64(days_lo)
    hi = np.datetime64(days_hi)
    span_days = (hi - lo).astype(int)
    if midnight:
        vals = lo + rng.integers(0, span_days + 1, n).astype("timedelta64[D]")
        return pa.array(vals.astype("datetime64[us]"))
    lo_us = lo.astype("datetime64[us]").astype(np.int64)
    hi_us = hi.astype("datetime64[us]").astype(np.int64)
    vals = rng.integers(lo_us, hi_us, n).astype("datetime64[us]")
    return pa.array(vals)


# --- region / nation -------------------------------------------------
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
write(
    "region",
    pa.table(
        {
            "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
            "r_name": REGIONS,
        }
    ),
)
write(
    "nation",
    pa.table(
        {
            "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": pa.array(
                rng.integers(0, 5, 25).astype(np.int32)
            ),
        }
    ),
)

# --- customer / supplier --------------------------------------------
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
write(
    "customer",
    pa.table(
        {
            "c_custkey": pa.array(np.arange(N_CUST, dtype=np.int64)),
            "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
            "c_nationkey": pa.array(
                rng.integers(0, 25, N_CUST).astype(np.int32)
            ),
            "c_acctbal": money(N_CUST, -1000.0, 10_000.0),
            "c_mktsegment": pa.array(rng.choice(SEGMENTS, N_CUST)),
        }
    ),
)
write(
    "supplier",
    pa.table(
        {
            "s_suppkey": pa.array(np.arange(N_SUPP, dtype=np.int64)),
            "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
            "s_nationkey": pa.array(
                rng.integers(0, 25, N_SUPP).astype(np.int32)
            ),
            "s_acctbal": money(N_SUPP, 0.0, 10_000.0),
        }
    ),
)

# --- part ------------------------------------------------------------
ADJ = ["small", "red", "blue", "hot", "cold", "big", "green", "dim"]
NOUN = ["ring", "widget", "bolt", "gear", "cog", "pin", "tube", "cap"]
TYPES = ["ECONOMY", "SMALL", "STANDARD", "LARGE", "PROMO ANODIZED", "PROMO BURNISHED"]
write(
    "part",
    pa.table(
        {
            "p_partkey": pa.array(np.arange(N_PART, dtype=np.int64)),
            "p_name": [
                f"{rng.choice(ADJ)} {rng.choice(NOUN)}" for _ in range(N_PART)
            ],
            "p_brand": pa.array(
                [f"Brand#{b}" for b in rng.integers(1, 26, N_PART)]
            ),
            "p_type": pa.array(rng.choice(TYPES, N_PART)),
            "p_size": pa.array(rng.integers(1, 51, N_PART).astype(np.int32)),
            "p_retailprice": money(N_PART, 900.0, 1000.0),
        }
    ),
)

# --- orders ----------------------------------------------------------
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
o_orderdate = us_ts("1995-01-01", "2001-08-01", N_ORD)
write(
    "orders",
    pa.table(
        {
            "o_orderkey": pa.array(np.arange(N_ORD, dtype=np.int64)),
            "o_custkey": pa.array(
                rng.integers(0, N_CUST, N_ORD).astype(np.int64)
            ),
            "o_orderstatus": pa.array(
                rng.choice(["P", "O", "F"], N_ORD, p=[0.25, 0.5, 0.25])
            ),
            "o_totalprice": money(N_ORD, 1000.0, 500_000.0),
            "o_orderdate": o_orderdate,
            "o_orderpriority": pa.array(rng.choice(PRIORITIES, N_ORD)),
        }
    ),
)

# --- lineitem --------------------------------------------------------
lines_per_order = rng.integers(1, 14, N_ORD)
keep = rng.random(N_ORD) < 0.985  # a few orders have no lineitems
lines_per_order = np.where(keep, lines_per_order, 0)
l_orderkey = np.repeat(np.arange(N_ORD, dtype=np.int64), lines_per_order)
N_LINE = len(l_orderkey)
l_linenumber = np.concatenate(
    [np.arange(1, n + 1, dtype=np.int32) for n in lines_per_order if n > 0]
)
ship_base = np.repeat(
    o_orderdate.to_numpy(zero_copy_only=False), lines_per_order
)
l_shipdate = ship_base + rng.integers(1, 122, N_LINE).astype("timedelta64[D]")
write(
    "lineitem",
    pa.table(
        {
            "l_orderkey": pa.array(l_orderkey),
            "l_partkey": pa.array(
                rng.integers(0, N_PART, N_LINE).astype(np.int64)
            ),
            "l_suppkey": pa.array(
                rng.integers(0, N_SUPP, N_LINE).astype(np.int64)
            ),
            "l_linenumber": pa.array(l_linenumber),
            "l_quantity": pa.array(
                rng.integers(1, 51, N_LINE).astype(np.float64)
            ),
            "l_extendedprice": money(N_LINE, 900.0, 105_000.0),
            "l_discount": pa.array(
                np.round(rng.integers(0, 11, N_LINE) / 100.0, 2)
            ),
            "l_tax": pa.array(np.round(rng.integers(0, 9, N_LINE) / 100.0, 2)),
            "l_returnflag": pa.array(rng.choice(["A", "N", "R"], N_LINE)),
            "l_linestatus": pa.array(rng.choice(["F", "O"], N_LINE)),
            "l_shipdate": pa.array(l_shipdate.astype("datetime64[us]")),
        }
    ),
)

# --- events ----------------------------------------------------------
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
write(
    "events",
    pa.table(
        {
            "event_id": pa.array(np.arange(N_EVT, dtype=np.int64)),
            "ts": us_ts("2024-01-01", "2024-01-31", N_EVT, midnight=False),
            "user_id": pa.array(
                rng.integers(0, max(N_EVT // 67, 10), N_EVT).astype(np.int64)
            ),
            "event_type": pa.array(
                rng.choice(EVENT_TYPES, N_EVT, p=[0.4, 0.3, 0.15, 0.1, 0.05])
            ),
            "value": money(N_EVT, 0.01, 500.0),
            "props": pa.array(
                [f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EVT)]
            ),
        }
    ),
)

# --- documents -------------------------------------------------------
VOCAB = (
    "key agg row scan slow fast table value part hash a the line sort "
    "window batch spark order data column join small customer query big "
    "group stream merge filter"
).split()
LANGS = ["en", "fr", "es", "de", "zh"]
texts = []
for _ in range(N_DOC):
    n_tok = rng.integers(5, 120)
    texts.append(" ".join(rng.choice(VOCAB, n_tok)))
# Seed some exact and near duplicates so dedup paths have work to do.
for i in range(0, N_DOC // 10 * 2, 2):
    texts[i + 1] = texts[i]
write(
    "documents",
    pa.table(
        {
            "doc_id": pa.array(np.arange(N_DOC, dtype=np.int64)),
            "text": texts,
            "lang": pa.array(rng.choice(LANGS, N_DOC)),
            "source": pa.array(
                [f"src{s}" for s in rng.integers(0, 20, N_DOC)]
            ),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    ),
)

# --- embeddings ------------------------------------------------------
labels = rng.integers(0, 10, N_DOC).astype(np.int32)
centers = rng.normal(0, 1, (10, DIM))
vecs = (
    centers[labels] + rng.normal(0, 0.3, (N_DOC, DIM))
).astype(np.float32)
write(
    "embeddings",
    pa.table(
        {
            "vec_id": pa.array(np.arange(N_DOC, dtype=np.int64)),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(labels),
        }
    ),
)
print(f"done → {OUT} (seed={SEED}, sf={SF})")
