"""Self-check of the __spark_entry__ driver contract: run every queries()
entry on Spark and its oracle_sql() on DuckDB at the given SF, compare row
count, column names, and an order-insensitive value hash (columns sorted by
name, rows sorted, values stringified) — mirroring the driver's gate.

Usage: python scripts/check_contract.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import math
import sys

sys.path.insert(0, "/root/repo")


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_value(r[i]) for i in order) for r in rows
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb

    import __spark_entry__ as ent
    from nabu_spark.session import get_spark

    spark = get_spark(app_name="contract-check", cores=8, shuffle_partitions=8)

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = ent.queries()
    oracles = ent.oracle_sql()
    failed = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows={len(srows)} (no oracle — rows-only check)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            failed.append(name)
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            h1 = table_hash(scols, [tuple(r) for r in srows])
            h2 = table_hash(ocols, orows)
            if h1 != h2:
                problems.append("value hash mismatch")
                order1 = sorted(range(len(scols)), key=lambda i: scols[i])
                order2 = sorted(range(len(ocols)), key=lambda i: ocols[i])
                s_set = sorted("\x1f".join(norm_value(r[i]) for i in order1) for r in srows)
                o_set = sorted("\x1f".join(norm_value(r[i]) for i in order2) for r in orows)
                for a, b in zip(s_set, o_set):
                    if a != b:
                        problems.append(f"first diff:\n  spark : {a[:200]}\n  oracle: {b[:200]}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"PASS {name}: rows={len(srows)}")

    # entry smoke
    try:
        edf = ent.entry(spark)
        n = edf.count()
        print(f"ENTRY rows={n} schema={edf.columns}")
        assert n >= 0
    except Exception as e:
        print(f"FAIL entry: {type(e).__name__}: {e}")
        failed.append("entry")

    print("FAILED:", failed if failed else "none")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
