"""Derive the ns / tz-UTC / null-injected fixture variants from a
generated dataset (see FIXTURES.md "Fixture-variant parity protocol").

Usage: python scripts/make_variants.py [src_dir] [out_base]
Defaults: /tmp/altdata/sf0.01 → /tmp/altdata-{ns,utc,null}/sf0.01

- ns:   every timestamp[us] column rewritten as timestamp[ns]
        (exercises Spark's nanosAsLong legacy read + footer-driven
        µs flooring in sources/catalog.py).
- utc:  every timestamp[us] column rewritten as timestamp[us, tz=UTC]
        (DuckDB reads TIMESTAMPTZ; Spark under a UTC session reads
        the same instants naive).
- null: ~2% NULLs injected into non-key value/descriptor columns
        (primary/foreign keys stay dense — the declared join
        contract).
"""

import glob
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/altdata/sf0.01"
BASE = sys.argv[2] if len(sys.argv) > 2 else "/tmp/altdata"
SF_LEAF = os.path.basename(SRC.rstrip("/"))

NULLABLE = {
    "customer": ["c_acctbal", "c_mktsegment"],
    "supplier": ["s_acctbal"],
    "part": ["p_type", "p_retailprice"],
    "orders": ["o_totalprice", "o_orderpriority"],
    "lineitem": ["l_tax", "l_returnflag"],
    "events": ["value", "props", "event_type"],
    "documents": ["text", "lang", "source"],
}


def retype_ts(dst: str, target: pa.DataType) -> None:
    os.makedirs(dst, exist_ok=True)
    for p in glob.glob(f"{SRC}/*.parquet"):
        t = pq.read_table(p)
        cols, changed = {}, False
        for f in t.schema:
            if str(f.type) == "timestamp[us]":
                cols[f.name] = t[f.name].cast(target)
                changed = True
            else:
                cols[f.name] = t[f.name]
        out = os.path.join(dst, os.path.basename(p))
        if changed:
            pq.write_table(pa.table(cols), out)
        else:
            shutil.copy(p, out)
    print(f"{dst}: done")


def null_inject(dst: str, rate: float = 0.02, seed: int = 777) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(dst, exist_ok=True)
    for p in glob.glob(f"{SRC}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        t = pq.read_table(p)
        cols = dict(zip(t.column_names, t.columns))
        for c in NULLABLE.get(name, []):
            mask = rng.random(t.num_rows) < rate
            vals = cols[c].to_pylist()
            for i in np.nonzero(mask)[0]:
                vals[i] = None
            cols[c] = pa.array(vals, type=cols[c].type)
        pq.write_table(pa.table(cols), os.path.join(dst, f"{name}.parquet"))
    print(f"{dst}: done")


retype_ts(f"{BASE}-ns/{SF_LEAF}", pa.timestamp("ns"))
retype_ts(f"{BASE}-utc/{SF_LEAF}", pa.timestamp("us", tz="UTC"))
null_inject(f"{BASE}-null/{SF_LEAF}")
