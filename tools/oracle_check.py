"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB, compare row count,
column names, and an order-insensitive value hash. Usage:

    python tools/oracle_check.py [--json PATH] [sf_dir] [name ...]

--json writes a machine-readable per-query attestation (the committed
ORACLE_SWEEP.json artifact): the driver's own correctness window covers
only the first 50 registry entries, so this file is how the overflow
queries' hash-verification is evidenced per round.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            f = float(v)
            return norm_cell(f)
    except Exception:
        pass
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    argv = sys.argv[1:]
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    from chapterbridge_ocr_worker_spark.conf import get_spark
    from chapterbridge_ocr_worker_spark.queries import QUERIES

    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'"
        )

    n_pass = n_fail = 0
    report: dict[str, dict] = {}
    for name, qd in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = qd.fn(spark, sf_dir)
            srows = df.collect()
            scols = df.columns
        except Exception as exc:
            print(f"FAIL {name}: spark error: {str(exc)[:300]}")
            report[name] = {"pass": False, "detail": f"spark error: {str(exc)[:200]}"}
            n_fail += 1
            continue
        if qd.sql is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows) "
                  f"[{time.time()-t0:.1f}s]")
            report[name] = {
                "pass": True, "mode": "rows-only", "rows": len(srows),
                "wall_s": round(time.time() - t0, 1),
            }
            n_pass += 1
            continue
        try:
            res = con.execute(qd.sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {str(exc)[:300]}")
            report[name] = {"pass": False, "detail": f"duckdb error: {str(exc)[:200]}"}
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        else:
            sh = value_hash([tuple(r) for r in srows], scols)
            dh = value_hash(drows, dcols)
            if sh != dh:
                problems.append(f"hash {sh} vs {dh}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            report[name] = {"pass": False, "detail": "; ".join(problems)}
            n_fail += 1
        else:
            print(f"ok   {name}: {len(srows)} rows match [{time.time()-t0:.1f}s]")
            report[name] = {
                "pass": True, "mode": "value-hash", "rows": len(srows),
                "wall_s": round(time.time() - t0, 1),
            }
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_path:
        import json as _json

        with open(json_path, "w") as f:
            _json.dump(
                {"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                 "queries": report},
                f, indent=1,
            )
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
