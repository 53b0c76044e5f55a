#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB at the
same scale factor, compare row count, sorted column names, and an
order-insensitive value hash.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
import traceback

# Import the repo package regardless of the launch cwd.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from evaluate_human_balance_with_spark_streaming_spark.session import get_spark


def _spark_kind(dt: str) -> str:
    if dt in ("bigint", "int", "smallint", "tinyint"):
        return "int"
    if dt in ("double", "float"):
        return "float"
    if dt.startswith("decimal"):
        return "decimal"
    if dt.startswith("timestamp"):
        return "ts"
    return {"string": "str", "date": "date", "boolean": "bool", "binary": "bytes"}.get(
        dt, dt
    )


def _pandas_kind(dtype, sample) -> str:
    import datetime
    import decimal

    k = dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "M":
        return "ts"
    if k == "b":
        return "bool"
    if k == "O":
        if isinstance(sample, str):
            return "str"
        if isinstance(sample, bytes):
            return "bytes"
        if isinstance(sample, decimal.Decimal):
            return "decimal"
        if isinstance(sample, datetime.datetime):
            return "ts"
        if isinstance(sample, datetime.date):
            return "date"
        return "obj:" + type(sample).__name__
    return k


def _dtype_kind_diffs(sdf, pdf):
    """Columns whose Spark type KIND differs from what the driver's
    pandas fetch of the DuckDB result yields (int vs float vs str...) —
    the value hash compares rendered cells, so a kind mismatch flips it
    even when the math agrees."""
    skinds = {c: _spark_kind(dt) for c, dt in sdf.dtypes}
    out = []
    for c in pdf.columns:
        if c not in skinds:
            continue
        nn = pdf[c].dropna()
        sample = nn.iloc[0] if len(nn) else None
        dk = _pandas_kind(pdf[c].dtype, sample)
        if sample is None and pdf[c].dtype.kind == "O":
            continue  # all-NULL object column: kind unknowable
        if dk != skinds[c]:
            out.append((c, skinds[c], dk))
    return out

# Single source: the package's table list — a table added there (and
# used by a new query + oracle) must get its DuckDB view here too, or
# every oracle referencing it fails with a confusing missing-table
# error.
from evaluate_human_balance_with_spark_streaming_spark.sources.testdata import (  # noqa: E402
    TABLES,
)


def normalize_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            # Defense-in-depth only: a Spark row with NaN hard-FAILS in
            # main() before any hashing (NULL is the sentinel; NaN is
            # invisible through the driver's pandas fetch), and oracle
            # rows have NaN→None applied at fetch time. If a NaN still
            # reaches here through some future path, collapse it to the
            # same NULL rendering the oracle side gets.
            return "NULL"
        # Collapse -0.0/0.0 and render with repr for full precision;
        # float() strips numpy scalar types (numpy 2 repr differs).
        v = float(v)
        if v == 0:
            return "0.0"
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def value_hash(rows: list[tuple], columns: list[str]) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(normalize_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    unknown = only - set(qs)
    if unknown:
        # A typo'd filter previously matched nothing and exited 0
        # having checked nothing — a vacuous green gate.
        print(
            f"ERROR: unknown query name(s): {sorted(unknown)} "
            f"(registry has {len(qs)} queries)",
            file=sys.stderr,
        )
        return 2

    spark = get_spark("ehb-correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        t_spark = time.time() - t0
        n_nan = sum(
            1
            for r in srows
            for v in r
            if isinstance(v, float) and math.isnan(v)
        )
        if n_nan:
            # A hard failure, not a WARN: the repo invariant is that no
            # query emits NaN (NULL is the sentinel), and the pandas
            # fetch on the oracle side collapses NaN to NULL — so a NaN
            # regression would otherwise sail through the hash.
            print(
                f"FAIL  {name}: {n_nan} NaN cells in the Spark result "
                "(queries must emit NULL, never NaN — NaN is invisible "
                "to the hash through the driver's pandas fetch)"
            )
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only check, {time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            # Fetch via pandas — the DRIVER's path. Round 1 proved the
            # difference matters: fetchall() keeps DuckDB HUGEINT as a
            # Python int (hash-matches Spark's bigint), while the
            # Arrow/pandas fetch turns it into float64 ("123.0" vs
            # "123") — the q_pivot_segment_status false-pass. Hashing
            # what pandas yields makes this gate a faithful emulator.
            pdf = con.execute(oracles[name]).df()
            ocols = list(pdf.columns)
            orows = [
                tuple(
                    None
                    if (isinstance(v, float) and math.isnan(v)) or v is pd.NaT
                    else v
                    for v in row
                )
                for row in pdf.itertuples(index=False, name=None)
            ]
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            n_fail += 1
            continue
        t_duck = time.time() - t0 - t_spark
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema spark={sorted(scols)} duckdb={sorted(ocols)}")
        dtype_diffs = [
            f"{c}: spark={sk} duckdb-pandas={dk}"
            for c, sk, dk in _dtype_kind_diffs(sdf, pdf)
        ]
        if dtype_diffs:
            problems.append("fetched-dtype mismatch [" + "; ".join(dtype_diffs) + "]")
        if not problems:
            sh = value_hash(srows, scols)
            oh = value_hash(orows, ocols)
            if sh != oh:
                problems.append("value hash mismatch")
                # Show a diff sample
                sset = set(
                    "\x1f".join(
                        normalize_cell(r[i])
                        for i in sorted(range(len(scols)), key=lambda i: scols[i])
                    )
                    for r in srows
                )
                oset = set(
                    "\x1f".join(
                        normalize_cell(r[i])
                        for i in sorted(range(len(ocols)), key=lambda i: ocols[i])
                    )
                    for r in orows
                )
                for s in list(sset - oset)[:3]:
                    print(f"        spark-only: {s!r}")
                for s in list(oset - sset)[:3]:
                    print(f"        duck-only:  {s!r}")
        t_cmp = time.time() - t0 - t_spark - t_duck
        if problems:
            print(
                f"FAIL  {name}: {'; '.join(problems)} "
                f"(spark {t_spark:.1f}s, duck {t_duck:.1f}s, cmp {t_cmp:.1f}s)"
            )
            n_fail += 1
        else:
            print(
                f"PASS  {name}: {len(srows)} rows "
                f"(spark {t_spark:.1f}s, duck {t_duck:.1f}s, cmp {t_cmp:.1f}s)"
            )
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
