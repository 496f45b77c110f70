"""Verify drive: mimic the driver's correctness gate — run every
queries() entry vs its oracle_sql() DuckDB result and compare
row-count + schema + order-insensitive values."""
import logging
import sys
import time

import duckdb
import numpy as np
import pandas as pd
import ray
from ray.data import DataContext

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
logging.getLogger("ray.data").setLevel(logging.ERROR)
DataContext.get_current().enable_progress_bars = False

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod  # noqa: E402

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    try:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    except Exception:
        pass

qs = entrymod.queries()
oracles = entrymod.oracle_sql()


def to_pdf(res):
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


fails = []
for name, fn in qs.items():
    if ONLY and name not in ONLY:
        continue
    t0 = time.perf_counter()
    try:
        mine = to_pdf(fn(SF))
    except Exception as e:
        print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
        fails.append(name)
        continue
    dt = time.perf_counter() - t0
    if name not in oracles:
        print(f"ok(rows-only) {name}: {len(mine)} rows {dt:.1f}s")
        continue
    try:
        want = con.sql(oracles[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
        fails.append(name)
        continue
    mine2 = mine[sorted(mine.columns)].copy()
    want2 = want[sorted(want.columns)].copy()
    if list(mine2.columns) != list(want2.columns):
        print(f"FAIL {name}: columns {list(mine2.columns)} vs {list(want2.columns)}")
        fails.append(name)
        continue
    if len(mine2) != len(want2):
        print(f"FAIL {name}: rows {len(mine2)} vs {len(want2)}")
        fails.append(name)
        continue
    mcols = sorted(mine2.columns)
    ms = mine2.sort_values(mcols).reset_index(drop=True)
    ws = want2.sort_values(mcols).reset_index(drop=True)
    bad = None
    for c in mcols:
        a, b = ms[c].to_numpy(), ws[c].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            eq = np.allclose(a.astype(float), b.astype(float), atol=1e-12,
                             equal_nan=True)
        else:
            eq = (a.astype(str) == b.astype(str)).all()
        if not eq:
            bad = c
            break
    if bad:
        mm = ms[~(ms[bad].astype(str) == ws[bad].astype(str))].head(3) \
            if ms[bad].dtype.kind != "f" else ms.head(3)
        print(f"FAIL {name}: column {bad} differs; sample mine={ms[bad].head(3).tolist()} want={ws[bad].head(3).tolist()}")
        fails.append(name)
    else:
        print(f"ok {name}: {len(mine2)} rows {dt:.1f}s")

print("FAILED:" if fails else "ALL MATCH", fails)
ray.shutdown()
