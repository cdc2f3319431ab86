"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at a given SF dir in Spark AND the matching
``oracle_sql()`` in DuckDB, then compares row count, column-name set, and an
order-insensitive value hash (columns sorted by name, rows sorted, values
canonicalized). Usage::

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(rows: list[tuple], colnames: list[str]) -> tuple[int, str]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.md5("\n".join(lines).encode()).hexdigest()
    return len(rows), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as ent
    from albedo_spark.session import get_spark

    spark = get_spark("correctness")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = ent.queries()
    oracles = ent.oracle_sql()
    print(
        f"# duckdb {duckdb.__version__}, sf_dir={sf_dir}, "
        f"{len(qs)} registered, filter={sorted(only) or 'none'}"
    )
    failed = []
    attempted = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        attempted += 1
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            sn, sh = table_hash(srows, scols)
        except Exception as exc:
            print(f"FAIL {name}: spark error {exc}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"pass {name}: rows-only (no oracle), {sn} rows")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = rel.columns
            orows = rel.fetchall()
            on, oh = table_hash(orows, ocols)
        except Exception as exc:
            print(f"FAIL {name}: duckdb error {exc}")
            failed.append(name)
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(ocols)}")
            failed.append(name)
        elif sn != on:
            print(f"FAIL {name}: rows spark={sn} duck={on}")
            failed.append(name)
        elif sh != oh:
            sset = {l for l in ("|".join(canon(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i])) for r in srows)}
            oset = {l for l in ("|".join(canon(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i])) for r in orows)}
            diff_s = sorted(sset - oset)[:3]
            diff_o = sorted(oset - sset)[:3]
            print(f"FAIL {name}: hash mismatch ({sn} rows). spark-only={diff_s} duck-only={diff_o}")
            failed.append(name)
        else:
            print(f"pass {name}: {sn} rows, hash {sh[:12]}")
    print(f"\n{attempted - len(failed)}/{attempted} pass")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
