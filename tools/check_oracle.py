"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry against ``oracle_sql()`` at sf0.01:
row count, sorted-column schema, and an order-insensitive value hash.
Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=repr
    )
    h = hashlib.sha256()
    for row in canon:
        h.update(repr(row).encode())
    return h.hexdigest()[:16]


def _norm(v):
    if hasattr(v, "item"):  # numpy scalar → python, KEEPING int/float kind
        v = v.item()
    if isinstance(v, float):
        if v != v:  # NaN
            return None
        return round(v, 9)
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod
    from spider_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            spd = sdf.toPandas()
            srows = [tuple(r) for r in spd.itertuples(index=False, name=None)]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows "
                  f"({time.time()-t0:.1f}s) cols={scols}")
            if not srows and name not in ("minhash_near_dups",):
                print(f"  WARNING: empty result")
            continue
        try:
            # .df() (pandas) mirrors the driver: DuckDB HUGEINT becomes
            # float64/object here, so SUM-of-int type drift is visible
            # locally instead of only in the driver's hash.
            dpd = con.sql(oracles[name]).df()
            dcols = list(dpd.columns)
            drows = [tuple(r) for r in dpd.itertuples(index=False, name=None)]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok_n = len(srows) == len(drows)
        ok_schema = sorted(scols) == sorted(dcols)
        ok_hash = (
            value_hash(srows, scols) == value_hash(drows, dcols)
            if ok_n and ok_schema else False
        )
        status = "OK   " if (ok_n and ok_schema and ok_hash) else "FAIL "
        if status.startswith("FAIL"):
            failures.append(name)
        print(f"{status} {name}: rows {len(srows)}/{len(drows)} "
              f"schema={ok_schema} hash={ok_hash} ({time.time()-t0:.1f}s)")
        if not ok_schema:
            print(f"   spark cols: {sorted(scols)}\n   duck  cols: {sorted(dcols)}")
        if ok_n and ok_schema and not ok_hash:
            ss = sorted(srows)[:3]
            dd = sorted(drows)[:3]
            print(f"   spark sample: {ss}\n   duck  sample: {dd}")
    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
