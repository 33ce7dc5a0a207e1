"""Local stand-in for the driver's correctness gate: runs each
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same parquet tables, then compares row sets (order-insensitive,
columns sorted by name, floats rounded)."""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm_cell(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "quantize"):  # Decimal
        return round(float(v), 6)
    return v


def _norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def compare_query(spark, name: str, qfn, sql: str | None, sf_dir: str) -> dict:
    sdf = qfn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    result = {"name": name, "rows": len(srows), "cols": scols}
    if sql is None:
        result["status"] = "rows-only" if len(srows) > 0 else "EMPTY-RESULT"
        return result
    con = duck_connect(sf_dir)
    ddf = con.execute(sql)
    dcols = [d[0] for d in ddf.description]
    drows = ddf.fetchall()
    if sorted(scols) != sorted(dcols):
        result["status"] = "SCHEMA-MISMATCH"
        result["spark_cols"] = scols
        result["duck_cols"] = dcols
        return result
    a = _norm_rows(scols, srows)
    b = _norm_rows(dcols, drows)
    if len(a) != len(b):
        result["status"] = f"ROWCOUNT-MISMATCH spark={len(a)} duck={len(b)}"
    elif a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y]
        result["status"] = f"VALUE-MISMATCH ({len(diffs)} rows)"
        result["first_diff"] = diffs[0] if diffs else None
    else:
        result["status"] = "OK"
    return result


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None):
    import __spark_entry__ as entry
    from readabilitysax_spark.sources.session import build_session

    spark = build_session(master="local[8]", shuffle_partitions=8)
    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            res = compare_query(spark, name, fn, oracles.get(name), sf_dir)
        except Exception as exc:  # noqa: BLE001
            res = {"name": name, "status": f"ERROR {type(exc).__name__}: {exc}"}
        ok = res.get("status") in ("OK", "rows-only")
        if not ok:
            failures += 1
        print(f"{'PASS' if ok else 'FAIL'} {name}: {res.get('status')} "
              f"rows={res.get('rows')}")
        if not ok and "first_diff" in res:
            print("   spark:", str(res["first_diff"][0])[:200])
            print("   duck :", str(res["first_diff"][1])[:200])
        if not ok and "spark_cols" in res:
            print("   spark cols:", res["spark_cols"])
            print("   duck  cols:", res["duck_cols"])
    spark.stop()
    return failures


if __name__ == "__main__":
    only = sys.argv[2:] or None
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    raise SystemExit(main(sf, only))
