"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL over the same parquet
tables, then compares row count, column-name set, and an
order-insensitive value hash (columns sorted by name, floats rounded to
6 decimals, rows sorted canonically) — the same contract
CORRECTNESS_r{N}.json is built from.

Round-6 hardening (VERDICT r5 "What's wrong" §3): the r1-r5 harness was
NOT predictive for output-type divergence — it fetched the oracle via
``fetchall()`` (DuckDB HUGEINT → exact Python int) and compared with
Python ``==`` (``65536.0 == 65536`` is True), so q232 (HUGEINT from
``sum(BIGINT)``) and q244 (DOUBLE from ``**``) were local-green but
driver-red for two rounds.  The driver's fetch path is arrow-shaped
(HUGEINT renders as float64, BIGINT-with-NULLs stays int64), so this
mirror now (a) fetches the oracle relation through ``rel.arrow()`` and
(b) tags every canonical value with its int/float/other class, making
``65536.0`` != ``65536``.  ``tests/test_oracle_dtype_parity.py`` closes
the class wholesale with a schema-level scan.
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(v: Any) -> Any:
    """Type-tagged canonical form: ints and floats never compare equal
    across the class boundary (the driver's hasher distinguishes them,
    so the local mirror must too — VERDICT r5)."""
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", round(v, 6))
    if isinstance(v, int):
        return ("i", v)
    if v is None:
        return None
    return ("s", str(v))


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    # Fetch through arrow: a leaked HUGEINT exports as decimal128(38,0)
    # (this duckdb; pandas .df() would render float64) — under the
    # tagged _canon either rendering can never compare equal to a Spark
    # bigint, while fetchall() converts HUGEINT to an exact Python int
    # and would hide the leak entirely.  BIGINT columns (NULLs
    # included) stay int64.  Extraction is POSITIONAL (per-column
    # to_pylist, zipped) — to_pylist() row dicts would silently
    # collapse duplicate output column names (r6 review catch).
    tbl = rel.arrow()
    d_rows = list(zip(*(tbl.column(i).to_pylist() for i in range(tbl.num_columns)))) if tbl.num_columns else []
    result = {
        "rows_spark": len(s_rows),
        "rows_oracle": len(d_rows),
        "cols_spark": sorted(s_cols),
        "cols_oracle": sorted(d_cols),
    }
    result["rows_match"] = result["rows_spark"] == result["rows_oracle"]
    result["schema_match"] = result["cols_spark"] == result["cols_oracle"]
    if result["rows_match"] and result["schema_match"]:
        cs = canonical_rows(s_cols, s_rows)
        cd = canonical_rows(d_cols, d_rows)
        result["values_match"] = cs == cd
        if not result["values_match"]:
            diff = [(a, b) for a, b in zip(cs, cd) if a != b][:5]
            result["first_diffs"] = diff
    else:
        result["values_match"] = False
    result["ok"] = result["rows_match"] and result["schema_match"] and result["values_match"]
    return result
