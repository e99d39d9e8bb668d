"""Local replica of the driver's correctness gate.

Runs every `queries()` entry and its `oracle_sql()` (DuckDB over the same
parquet) at sf0.01, compares row count, schema (column names sorted), and a
value hash (rows sorted, columns sorted by name, values stringified with
float rounding), mirroring CORRECTNESS_r{N}.json. Usage:

    python scripts/check_oracle.py [query ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon(val):
    if val is None:
        return "NULL"
    if isinstance(val, float):
        return f"{val:.9g}"
    if isinstance(val, bool):
        return "true" if val else "false"
    return str(val)


def _hash_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> None:
    import duckdb

    import __spark_entry__ as entry
    from linkgraph.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(app_name="oracle-gate", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    out = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            sdf = fn(spark, SF)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
            rec["spark_rows"] = len(srows)
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"spark: {e}"
            out[name] = rec
            print(name, "SPARK-ERR", str(e)[:200])
            continue
        sql = oracles.get(name)
        if sql is None:
            rec["err"] = "no_oracle"
            out[name] = rec
            print(f"{name:24s} rows={len(srows)} (no_oracle)")
            continue
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            rec["oracle_rows"] = len(orows)
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"oracle: {e}"
            out[name] = rec
            print(name, "ORACLE-ERR", str(e)[:200])
            continue
        rec["rows_match"] = len(srows) == len(orows)
        rec["schema_match"] = sorted(scols) == sorted(ocols)
        rec["hash_match"] = (
            rec["schema_match"]
            and _hash_rows(scols, srows) == _hash_rows(ocols, orows)
        )
        ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        print(f"{name:24s} rows={len(srows)}/{len(orows)} "
              f"schema={rec['schema_match']} hash={rec['hash_match']} "
              f"{'PASS' if ok else '*** FAIL ***'}")
        out[name] = rec
    bad = [k for k, v in out.items()
           if v["err"] not in (None, "no_oracle") or v["hash_match"] is False
           or v["rows_match"] is False or v["schema_match"] is False]
    print(json.dumps({"n": len(out), "fail": bad}))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
