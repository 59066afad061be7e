"""Local replica of the round driver's CORRECTNESS gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, schema (column names), and a value hash computed
after sorting columns by name and rows by all columns — the driver's
documented compare. Exit code 1 if any query is red.

Usage:
    python scripts/oracle_sweep.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].map(
                lambda v: json.dumps(v, sort_keys=True, default=str)
                if isinstance(v, (list, dict, np.ndarray))
                else v
            )
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


def _value_hash(pdf: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in pdf.columns:
        col = pdf[c]
        if np.issubdtype(col.dtype, np.floating):
            h.update(np.ascontiguousarray(col.to_numpy(np.float64)).tobytes())
        elif np.issubdtype(col.dtype, np.integer):
            h.update(np.ascontiguousarray(col.to_numpy(np.int64)).tobytes())
        else:
            h.update("\x1f".join("" if v is None else str(v) for v in col).encode())
    return h.hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from hoshizora_spark.session import get_spark

    spark = get_spark(app_name="oracle_sweep", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failed = []
    ran = 0  # queries actually executed (CLI `only` filter excluded)
    rows_only = 0  # executed but rows-only checked (no oracle entry)
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran += 1
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {e}")
            failed.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"{name}: no_oracle rows={len(sdf)}")
            rows_only += 1
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {e}")
            failed.append(name)
            continue
        rows = len(sdf) == len(odf)
        schema = sorted(sdf.columns) == sorted(odf.columns)
        hmatch = False
        if rows and schema:
            a, b = _canon(sdf), _canon(odf)
            dt = all(a[c].dtype == b[c].dtype for c in a.columns)
            hmatch = dt and _value_hash(a) == _value_hash(b)
            if not hmatch:
                for c in a.columns:
                    if a[c].dtype != b[c].dtype:
                        print(f"  {name}.{c}: spark {a[c].dtype} vs oracle {b[c].dtype}")
                    elif _value_hash(a[[c]]) != _value_hash(b[[c]]):
                        bad = a[c] != b[c]
                        print(
                            f"  {name}.{c}: {int(bad.sum())} differing values, "
                            f"first: {a[c][bad].head(2).tolist()} vs {b[c][bad].head(2).tolist()}"
                        )
        ok = rows and schema and hmatch
        print(
            f"{name}: {'OK' if ok else 'FAIL'} rows={len(sdf)}/{len(odf)} "
            f"schema={schema} hash={hmatch}"
        )
        if not ok:
            failed.append(name)
    compared = ran - rows_only
    print(
        f"\n{compared - len(failed)}/{compared} value-compared green"
        + (f" ({rows_only} rows-only)" if rows_only else "")
        + (f" ({len(qs) - ran} skipped by filter)" if ran < len(qs) else "")
        + (f"; FAILED: {failed}" if failed else "")
    )
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
