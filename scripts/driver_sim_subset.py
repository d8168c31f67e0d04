"""Run the driver's comparison discipline over a named subset of registered
queries at one or more scale factors — the fast pre-commit gate for a window
rotation (full parity sweep takes ~25 min; this takes ~2).

Usage: python scripts/driver_sim_subset.py q1 q2 ... [--sf=/root/testdata/sf0.01]
(--sf= may repeat; default is both gate scales, sf0.001 then sf0.01)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from h2outility_spark import workload
from h2outility_spark.sources.parquet import TABLES


from h2outility_spark.oracle_compare import normalize_rows as _normalize


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sfs = [a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--sf=")] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
    ]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "12g")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("driver-sim-subset")
        .getOrCreate()
    )
    reg = workload.registry()
    failed = []
    for sf_dir in sfs:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        for name in names:
            spec = reg.get(name)
            if spec is None:
                failed.append((sf_dir, name))
                print(f"{sf_dir} {name} ERROR: not a registered query", flush=True)
                continue
            t0 = time.time()
            try:
                sdf = spec.fn(spark, sf_dir)
                scols = sdf.columns
                srows = [tuple(r) for r in sdf.collect()]
                cur = con.execute(spec.oracle)
                dcols = [d[0] for d in cur.description]
                drows = cur.fetchall()
                ok_cols = sorted(scols) == sorted(dcols)
                ok_rows = len(srows) == len(drows)
                _, sn = _normalize(srows, scols)
                _, dn = _normalize(drows, dcols)
                ok_vals = sn == dn
                ok = ok_cols and ok_rows and ok_vals
                print(
                    f"{sf_dir.rsplit('/',1)[-1]:8s} {name:28s} "
                    f"rows={len(srows)}/{len(drows)} cols={ok_cols} "
                    f"vals={ok_vals} {'OK' if ok else 'FAIL'} "
                    f"({time.time()-t0:.1f}s)",
                    flush=True,
                )
                if not ok:
                    failed.append((sf_dir, name))
                    if not ok_vals and sn and dn:
                        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
                        print(f"    first diffs: {diffs}", flush=True)
            except Exception as e:  # noqa: BLE001
                failed.append((sf_dir, name))
                print(f"{sf_dir} {name} ERROR: {e!r}", flush=True)
        con.close()
    print("FAILED:" if failed else "ALL GREEN", failed, flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
