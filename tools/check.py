"""Local stand-in for the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` mirror on DuckDB at
sf0.01, compare row count, column names/dtypes, and cell values
(order-insensitive: rows sorted by all columns, columns sorted by name).

Usage: python tools/check.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or hasattr(v, "tolist") and not isinstance(v, str) else v
            )
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _cells_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cells_equal(x, y) for x, y in zip(a, b))
    if (a is None) != (b is None):
        return False
    if a is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(f"columns: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"rowcount: spark={len(spark_df)} duck={len(duck_df)}")
    s, d = _norm(spark_df), _norm(duck_df)
    for c in s.columns:
        if str(s[c].dtype) != str(d[c].dtype):
            problems.append(f"dtype[{c}]: spark={s[c].dtype} duck={d[c].dtype}")
    n = min(len(s), len(d))
    bad = 0
    for i in range(n):
        for c in s.columns:
            if not _cells_equal(s[c].iloc[i], d[c].iloc[i]):
                if bad < 3:
                    problems.append(f"value[{i}][{c}]: spark={s[c].iloc[i]!r} duck={d[c].iloc[i]!r}")
                bad += 1
    if bad:
        problems.append(f"total mismatched cells: {bad}")
    return problems


def main():
    only = set(sys.argv[1:])
    sf_dir = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")

    import __spark_entry__ as entry_mod
    from connapse_spark.session import get_spark

    spark = get_spark(cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t)}.parquet'"
        )

    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            results[name] = ["SPARK ERROR: " + traceback.format_exc(limit=4).splitlines()[-1]]
            print(f"FAIL {name}: spark error\n{traceback.format_exc(limit=6)}")
            continue
        if name not in sqls:
            results[name] = [] if len(sdf) >= 0 else ["no rows"]
            print(f"okR  {name}: rows-only, {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.execute(sqls[name]).df()
        except Exception:
            results[name] = ["DUCK ERROR: " + traceback.format_exc(limit=4).splitlines()[-1]]
            print(f"FAIL {name}: duckdb error\n{traceback.format_exc(limit=4)}")
            continue
        problems = compare(name, sdf, ddf)
        results[name] = problems
        status = "ok  " if not problems else "FAIL"
        print(f"{status} {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
        for p in problems:
            print(f"     - {p}")
    n_fail = sum(1 for v in results.values() if v)
    print(f"\n{len(results) - n_fail}/{len(results)} queries match")
    if not only:
        # full-gate evidence (VERDICT r6 ask #3): persist name → verdict so
        # drift OUTSIDE the driver's 50-query window is observable in the
        # round diff. Written only for full runs — a filtered run would
        # shadow the full record.
        import json

        self_path = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_SELF.json")
        with open(os.path.abspath(self_path), "w") as f:
            json.dump(
                {name: {"ok": not probs, "problems": probs}
                 for name, probs in sorted(results.items())},
                f, indent=1,
            )
        print(f"wrote CORRECTNESS_SELF.json ({len(results)} queries)")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
