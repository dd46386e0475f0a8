"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` mirror on
DuckDB at the given sf dir, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted).

Usage: python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, ".")


def _hash_rows(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        tuple(_canon_val(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for row in canon:
        h.update(repr(row).encode())
    return h.hexdigest()[:16]


def _canon_val(v):
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(v)
    return str(v)


def _dtype_hazards(con, sql: str, sdf) -> list[str]:
    """Driver-canon hazard scan: the driver hashes via Arrow/pandas, so
    types this repo's fetchall-based compare collapses silently still
    break the real gate. Flag (a) DuckDB HUGEINT/DECIMAL output columns
    (uncast sum()/arithmetic widens; Arrow hashes decimal128 unlike
    Spark's int64) and (b) complex-typed (list/struct/map) columns on
    either side (pandas sort_values dies on list cells). DESCRIBE only
    — nothing is executed."""
    hazards = []
    for r in con.execute(f"DESCRIBE {sql}").fetchall():
        cname, ctype = r[0], r[1]
        u = ctype.upper()
        # elif: a DECIMAL[] column matches both checks — one hazard entry
        # per column is enough (ADVICE r5)
        if "HUGEINT" in u or "INT128" in u or "DECIMAL" in u:
            hazards.append(f"duck:{cname}:{ctype}")
        elif "[]" in u or "STRUCT" in u or "MAP(" in u:
            hazards.append(f"duck:{cname}:{ctype}")
    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType
    for f in sdf.schema.fields:
        if isinstance(f.dataType, (ArrayType, MapType, StructType,
                                   DecimalType)):
            hazards.append(f"spark:{f.name}:{f.dataType.simpleString()}")
    return hazards


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from spikex_spark.session import get_spark

    spark = get_spark(app_name="verify_oracle")

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t_spark = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"{name:24s} rows={len(srows):7d} spark={t_spark:6.1f}s "
                  f"(no oracle — rows-only)")
            continue
        t0 = time.time()
        res = con.execute(sql)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        t_duck = time.time() - t0
        hazards = _dtype_hazards(con, sql, sdf)
        ok_cols = sorted(scols) == sorted(dcols)
        ok_rows = len(srows) == len(drows)
        ok_hash = (
            ok_cols and ok_rows
            and _hash_rows(scols, srows) == _hash_rows(dcols, drows)
        )
        status = "OK" if ok_hash and not hazards else "FAIL"
        if not ok_hash or hazards:
            failures += 1
        print(f"{name:24s} rows={len(srows):7d}/{len(drows):<7d} "
              f"cols={'=' if ok_cols else 'DIFF'} hash={'=' if ok_hash else 'DIFF'} "
              f"spark={t_spark:5.1f}s duck={t_duck:5.1f}s  {status}"
              + (f"  HAZARD {hazards}" if hazards else ""))
        if not ok_hash and ok_cols and ok_rows:
            # print first differing rows for debugging
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            sset = sorted(tuple(_canon_val(r[i]) for i in order) for r in srows)
            dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
            dset = sorted(tuple(_canon_val(r[i]) for i in dorder) for r in drows)
            for a, b in zip(sset, dset):
                if a != b:
                    print("   spark:", a)
                    print("   duck :", b)
                    break
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
