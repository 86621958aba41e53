"""Pre-validate every queries() entry against its DuckDB oracle, the way
the external driver does: row count, column names, order-insensitive
value comparison on name-sorted columns.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"columns: ray={sorted(got.columns)} sql={sorted(want.columns)}")
        return problems
    if len(got) != len(want):
        problems.append(f"rows: ray={len(got)} sql={len(want)}")
    g, w = normalize(got), normalize(want)
    if len(g) == len(w):
        for c in g.columns:
            gv, wv = g[c], w[c]
            # Dtype-strict, like the external driver's value hash: an int64 Ray
            # column vs a float64 oracle column (e.g. DuckDB HUGEINT SUM) hashes
            # 150 vs 150.0 and FAILS there, so it must fail here too.
            g_float = np.issubdtype(gv.dtype, np.floating)
            w_float = np.issubdtype(wv.dtype, np.floating)
            if g_float != w_float:
                problems.append(
                    f"col {c}: dtype kind mismatch ray={gv.dtype} sql={wv.dtype} "
                    f"(driver hashes these differently — cast the oracle SQL)"
                )
                continue
            ok = (gv.astype(str).values == wv.astype(str).values).all()
            if not ok:
                bad = (gv.astype(str).values != wv.astype(str).values)
                idx = int(np.argmax(bad)) if bad.any() else 0
                problems.append(
                    f"col {c}: first diff at row {idx}: ray={gv.iloc[idx]!r} sql={wv.iloc[idx]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    from anycrawl_ray.util import init_local_ray

    init_local_ray(8)

    import __ray_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"ERROR  {name}: ray side raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS   {name}: {len(got)} rows (no oracle)")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"ERROR  {name}: oracle SQL raised {e}")
            failures += 1
            continue
        problems = compare(name, got, want)
        if problems:
            failures += 1
            print(f"FAIL   {name}: " + "; ".join(problems))
        else:
            print(f"OK     {name}: {len(got)} rows")
    import ray

    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
