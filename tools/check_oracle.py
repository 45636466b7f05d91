"""Local stand-in for the driver's correctness gate.

Runs each __spark_entry__.queries() entry on Spark and the matching
oracle_sql() on DuckDB over the same parquet tables, then compares
row count, sorted column names, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from entity_linking_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(df) -> tuple[int, list[str], str]:
    """(row_count, sorted columns, value hash) — columns sorted by name,
    rows sorted by their string form, values stringified."""
    import pandas as pd

    pdf = df if isinstance(df, pd.DataFrame) else df.toPandas()
    cols = sorted(pdf.columns)
    pdf = pdf[cols]

    def cell(v):
        if v is None or v != v:
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6f}"
        if hasattr(v, "tolist"):  # numpy arrays / list cells
            return str([cell(x) for x in v.tolist()])
        if isinstance(v, (list, tuple)):
            return str([cell(x) for x in v])
        return str(v)

    lines = sorted(
        "\x01".join(cell(v) for v in row) for row in pdf.itertuples(index=False)
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(pdf), cols, h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        s_n, s_cols, s_h = _canon(sdf)
        if name not in oracles:
            print(f"{name:35s} rows={s_n:<7d} (rows-only: no oracle)")
            continue
        o_n, o_cols, o_h = _canon(con.execute(oracles[name]).df())
        ok = (s_n, s_cols, s_h) == (o_n, o_cols, o_h)
        status = "OK " if ok else "FAIL"
        print(f"{name:35s} {status} spark=({s_n},{s_h}) duck=({o_n},{o_h})")
        if not ok:
            failures += 1
            if s_cols != o_cols:
                print(f"    cols spark={s_cols}\n    cols duck ={o_cols}")
            elif s_n != o_n:
                print(f"    rowcount spark={s_n} duck={o_n}")
            else:
                # first differing rows for debugging
                import pandas as pd

                sp = sdf.toPandas()[sorted(s_cols)]
                dp = con.execute(oracles[name]).df()[sorted(o_cols)]
                sp_l = sorted(map(str, sp.itertuples(index=False)))
                dp_l = sorted(map(str, dp.itertuples(index=False)))
                for a, b in zip(sp_l, dp_l):
                    if a != b:
                        print(f"    spark: {a[:200]}\n    duck : {b[:200]}")
                        break
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
