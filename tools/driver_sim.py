"""Driver-correctness simulator: run every oracle-backed workload query
on Spark AND DuckDB at the driver's scale (sf0.01 by default) and diff
the RAW results the way a dtype-sensitive value-hash would — i.e. flag
not just value differences but any pre-normalization dtype divergence
(DuckDB HUGEINT/DECIMAL→object, int32 vs int64, Decimal vs float...).

Round 1 lesson: `ts_sessionize` passed the repo's normalized compare but
failed the driver's value hash because the oracle emitted an int128
window-sum. This script exists so that class of bug is caught BEFORE the
driver runs.

Usage: python tools/driver_sim.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from monolith_spark.session import get_spark
from monolith_spark.testing import duckdb_connection, compare_frames
from monolith_spark.workload import all_queries


def dtype_report(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    out = []
    for c in sorted(spark_pdf.columns):
        if c not in oracle_pdf.columns:
            continue
        a, b = spark_pdf[c].dtype, oracle_pdf[c].dtype
        if a != b:
            out.append(f"dtype[{c}]: spark={a} oracle={b}")
        elif a == object:
            # same dtype 'object' can still hide int vs Decimal vs str —
            # compare the first non-null ELEMENT type on each side
            sv = spark_pdf[c].dropna()
            ov = oracle_pdf[c].dropna()
            st = type(sv.iloc[0]).__name__ if len(sv) else None
            ot = type(ov.iloc[0]).__name__ if len(ov) else None
            if st != ot:
                out.append(f"objtype[{c}]: spark elem {st} oracle elem {ot}")
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="driver-sim")
    qs = all_queries()
    con = duckdb_connection(sf_dir)
    n_bad = 0
    for name, q in qs.items():  # registry order == driver check order
        if only and name not in only:
            continue
        if q.oracle is None:
            try:
                n = q.spark_fn(spark, sf_dir).count()
                print(f"{'ROWS-ONLY':9s} {name}: {n} rows")
            except Exception as e:  # noqa: BLE001
                n_bad += 1
                print(f"{'ERROR':9s} {name}: {e}")
            continue
        try:
            spdf = q.spark_fn(spark, sf_dir).toPandas()
            opdf = con.sql(q.oracle).df()
        except Exception as e:  # noqa: BLE001
            n_bad += 1
            print(f"{'ERROR':9s} {name}: {type(e).__name__}: {str(e)[:300]}")
            continue
        problems = compare_frames(spdf, opdf)
        dt = dtype_report(spdf, opdf)
        if problems or dt:
            n_bad += 1
            print(f"{'MISMATCH' if problems else 'DTYPE':9s} {name}: "
                  f"{problems + dt}")
        else:
            print(f"{'ok':9s} {name}: {len(spdf)} rows")
    con.close()
    print(f"\n{n_bad} queries flagged")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
