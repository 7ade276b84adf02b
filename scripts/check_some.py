"""Targeted driver-contract replay: like check_entry.py but only for the
query names given on the CLI (all queries if none), at the sf dir in
$CHECK_SF (default sf0.001 for fast iteration; the full gate stays
check_entry.py at sf0.01)."""
import os
import sys
import time

import duckdb
from pyspark.sql import SparkSession

SF = os.environ.get("CHECK_SF", "/root/testdata/sf0.001")
spark = (SparkSession.builder.master("local[8]").appName("check-some")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E  # noqa: E402

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs = E.queries()
oracles = E.oracle_sql()
names = sys.argv[1:] or list(qs)
unknown = [n for n in names if n not in qs]
if unknown:
    print(f"unknown queries: {unknown}")
    sys.exit(2)

fails = []
for name in names:
    t0 = time.time()
    try:
        sdf = qs[name](spark, SF).toPandas()
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
        fails.append(name)
        continue
    dt = time.time() - t0
    if name not in oracles:
        print(f"ok(rows-only) {name}: {len(sdf)} rows  [{dt:.1f}s]")
        continue
    try:
        odf = con.sql(oracles[name]).df()
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: oracle error {type(e).__name__}: "
              f"{str(e)[:300]}")
        fails.append(name)
        continue
    ok = True
    msgs = []
    if len(sdf) != len(odf):
        ok = False
        msgs.append(f"rowcount {len(sdf)} vs {len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        ok = False
        msgs.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
    if ok and len(sdf):
        a = sdf[sorted(sdf.columns)].copy()
        b = odf[sorted(sdf.columns)].copy()
        a = a.sort_values(by=list(a.columns)).reset_index(drop=True)
        b = b.sort_values(by=list(b.columns)).reset_index(drop=True)
        for c in a.columns:
            try:
                if a[c].astype(str).tolist() != b[c].astype(str).tolist():
                    ok = False
                    msgs.append(
                        f"values differ in {c}: {a[c].head(3).tolist()} "
                        f"vs {b[c].head(3).tolist()}")
            except Exception as e:  # noqa: BLE001
                ok = False
                msgs.append(f"cmp error {c}: {e}")
    status = "MATCH" if ok else "MISMATCH " + "; ".join(msgs)
    print(f"{'ok' if ok else 'FAIL'} {name}: {len(sdf)} rows {status}  "
          f"[{dt:.1f}s]")
    if not ok:
        fails.append(name)

print(f"\n{len(fails)} failures: {fails}")
spark.stop()
sys.exit(1 if fails else 0)
