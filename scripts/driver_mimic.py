"""Mimic the external correctness driver as closely as possible:

run each catalog query on Spark and its DuckDB oracle over the same
parquet tables, convert BOTH to pandas, sort by all columns (this is
what crashes on unhashable array cells — our pytest parity harness
stringifies cells and would not catch that), then compare row count,
column names, and exact values.

Usage: python scripts/driver_mimic.py [names...]   (default: all oracle-backed)
       SF_DIR=/root/testdata/sf0.01 python scripts/driver_mimic.py
       python scripts/driver_mimic.py --never-sampled --out MIMIC_r06.json

--never-sampled selects exactly the oracle-backed entries that have no
row in ANY committed CORRECTNESS_r*.json (the driver samples the first
50 registry entries and the registry must not be reordered — VERDICT
r4/r5); --out writes the per-entry results as JSON so each round can
commit auditable mimic evidence for that blind spot.
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from news_graph_rag_spark.queries import registry  # noqa: E402
from news_graph_rag_spark.queries.catalog import TABLES  # noqa: E402
from news_graph_rag_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def _canon(df):
    import pandas as pd

    df = df.copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].map(lambda v: repr(float(v)) if pd.notna(v) else "nan")
        else:
            df[c] = df[c].astype(str)
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def _never_sampled(reg) -> list[str]:
    """Oracle-backed entries with no GREEN row in any committed
    CORRECTNESS_r*.json. Only rows+schema+hash all true with err null
    count as covered (VERDICT r7 #2): the round-4 crash left `err` rows
    for four entries, and treating ANY presence as coverage hid them
    from MIMIC for three rounds."""
    import glob

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    covered: set[str] = set()
    for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            with open(p) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in doc.items():
            if not isinstance(row, dict):
                continue
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and row.get("err") is None
            ):
                covered.add(name)
    return sorted(n for n, q in reg.items() if q.oracle and n not in covered)


def main():
    args = sys.argv[1:]
    out_path = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    reg = registry()
    if "--never-sampled" in args:
        args.remove("--never-sampled")
        names = _never_sampled(reg) + args
    else:
        names = args
    if not names:
        names = [n for n, q in reg.items() if q.oracle]
    spark = get_spark("driver-mimic", cpus=int(os.environ.get("CPUS", "8")))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    results = {}
    for n in names:
        q = reg[n]
        try:
            sdf = q.fn(spark, SF_DIR)
            # driver sorts pandas by all columns — arrays crash here
            spd = sdf.toPandas()
            spd_c = _canon(spd)
            if q.oracle is None:
                results[n] = {"rows": len(spd_c), "oracle": None, "ok": True}
                continue
            opd = con.execute(q.oracle).fetchdf()
            opd_c = _canon(opd)
            ok = (
                len(spd_c) == len(opd_c)
                and list(spd_c.columns) == list(opd_c.columns)
                and spd_c.equals(opd_c)
            )
            results[n] = {
                "rows": len(spd_c),
                "oracle_rows": len(opd_c),
                "cols_match": list(spd_c.columns) == list(opd_c.columns),
                "ok": bool(ok),
            }
            if not ok:
                results[n]["spark_cols"] = list(spd_c.columns)
                results[n]["oracle_cols"] = list(opd_c.columns)
        except Exception:
            results[n] = {"ok": False, "err": traceback.format_exc()[-1500:]}
        status = "OK " if results[n].get("ok") else "FAIL"
        print(f"{status} {n} {json.dumps({k: v for k, v in results[n].items() if k != 'err'})}",
              flush=True)
        if results[n].get("err"):
            print(results[n]["err"][-600:], flush=True)
    bad = [n for n, r in results.items() if not r.get("ok")]
    print(f"\n{len(results) - len(bad)}/{len(results)} ok; failing: {bad}")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(
                {"sf_dir": SF_DIR, "n_ok": len(results) - len(bad), "results": results},
                f,
                indent=1,
            )
        print(f"wrote {out_path}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
