"""Local mirror of the driver's correctness gate.

Runs entry(spark) as a smoke check, then every queries()[name] at sf0.01 and
compares against oracle_sql()[name] in DuckDB: row count, column-name set,
and order-insensitive value comparison (rows sorted, columns sorted by name,
floats compared with tolerance). Exit 0 only if everything matches.
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def rows_to_sorted(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def cells_equal(a, b):
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is b
        return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def _value_md5(sorted_rows) -> str:
    """md5 over the sorted normalized rows with floats quantized to 8
    significant digits — informational fingerprint; the authoritative
    per-query verdict is the tolerance-based compare (values_match)."""
    import hashlib

    h = hashlib.md5()
    for row in sorted_rows:
        for v in row:
            if isinstance(v, float):
                h.update(f"{v:.8g}|".encode())
            else:
                h.update((repr(v) + "|").encode())
        h.update(b";")
    return h.hexdigest()


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from tldr_spark.session import build_session

    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    only = set(args)
    report: dict[str, dict] = {}
    spark = build_session("verify-entry", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    failures = []

    if not only:
        t0 = time.monotonic()
        res = entrymod.entry(spark)
        n = len(res.collect())
        print(f"entry: {n} rows, schema={res.columns} [{time.monotonic()-t0:.1f}s]", file=sys.stderr)
        if n < 1:
            failures.append("entry returned no rows")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            df = fn(spark, SF_DIR)
            cols = df.columns
            rows = df.collect()
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: SPARK ERROR {exc}")
            print(f"{name}: SPARK ERROR {str(exc)[:200]}", file=sys.stderr)
            continue
        if name not in oracles:
            print(f"{name}: rows-only, {len(rows)} rows [{time.monotonic()-t0:.1f}s]", file=sys.stderr)
            report[name] = {
                "status": "rows_only" if rows else "rows_only_empty",
                "rows": len(rows),
                "n_cols": len(cols),
                "spark_value_md5": _value_md5(
                    rows_to_sorted([tuple(r) for r in rows], cols)
                ),
                "elapsed_s": round(time.monotonic() - t0, 2),
            }
            if len(rows) == 0:
                failures.append(f"{name}: 0 rows (rows-only check)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: DUCKDB ERROR {exc}")
            print(f"{name}: DUCKDB ERROR {str(exc)[:200]}", file=sys.stderr)
            continue
        status = []
        if sorted(cols) != sorted(ocols):
            status.append(f"schema mismatch spark={sorted(cols)} duck={sorted(ocols)}")
        if len(rows) != len(orows):
            status.append(f"rowcount spark={len(rows)} duck={len(orows)}")
        if not status:
            a = rows_to_sorted([tuple(r) for r in rows], cols)
            b = rows_to_sorted(orows, ocols)
            bad = 0
            for ra, rb in zip(a, b):
                if not all(cells_equal(x, y) for x, y in zip(ra, rb)):
                    bad += 1
                    if bad <= 3:
                        status.append(f"value diff: {ra} vs {rb}")
            if bad > 3:
                status.append(f"... {bad} differing rows total")
        a = rows_to_sorted([tuple(r) for r in rows], cols)
        b = rows_to_sorted(orows, ocols)
        report[name] = {
            "status": "mismatch" if status else "match",
            "rows": len(rows),
            "n_cols": len(cols),
            "spark_value_md5": _value_md5(a),
            "oracle_value_md5": _value_md5(b),
            "elapsed_s": round(time.monotonic() - t0, 2),
        }
        if status:
            report[name]["detail"] = status[:4]
            failures.append(f"{name}: " + "; ".join(status[:4]))
            print(f"{name}: MISMATCH — {status[0]}", file=sys.stderr)
        else:
            print(f"{name}: OK {len(rows)} rows [{time.monotonic()-t0:.1f}s]", file=sys.stderr)

    spark.stop()
    if json_path:
        import datetime
        import json as jsonlib

        payload = {
            "generated_by": "scripts/verify_entry.py",
            "sf_dir": SF_DIR,
            "generated_at_utc": datetime.datetime.now(
                datetime.timezone.utc
            ).isoformat(timespec="seconds"),
            "n_queries": len(report),
            "n_match": sum(1 for r in report.values() if r["status"] == "match"),
            "n_rows_only": sum(
                1 for r in report.values() if r["status"].startswith("rows_only")
            ),
            "n_mismatch": sum(
                1 for r in report.values() if r["status"] == "mismatch"
            ),
            "queries": report,
        }
        with open(json_path, "w") as fh:
            jsonlib.dump(payload, fh, indent=1)
        print(f"wrote {json_path}", file=sys.stderr)
    if failures:
        print("\nFAILURES:", file=sys.stderr)
        for f in failures:
            print("  " + f, file=sys.stderr)
        return 1
    print("\nALL QUERIES MATCH", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
