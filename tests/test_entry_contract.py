"""Driver-contract integrity — fast structural checks (no SparkSession):
every oracle key maps to a registered query, SQL parses in DuckDB's
planner shape (non-empty, single statement), and the registry is stable.
The value-level gate is scripts/verify_entry.py."""

from __future__ import annotations

import importlib
import sys


def _entry():
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as m

    return importlib.reload(m)


def test_every_oracle_has_a_query():
    m = _entry()
    qs, osql = m.queries(), m.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 55
    assert len(osql) >= 48


def test_oracle_sql_is_wellformed():
    m = _entry()
    for name, sql in m.oracle_sql().items():
        assert sql.strip(), name
        assert ";" not in sql, name  # single statement for the driver harness


def test_oracle_sql_plans_in_duckdb():
    # EXPLAIN against empty stand-in views: catches syntax/typo drift in
    # every oracle without touching parquet or Spark
    import duckdb

    m = _entry()
    con = duckdb.connect()
    tables = {
        "region": "r_regionkey BIGINT",
        "nation": "n_nationkey BIGINT",
        "customer": "c_custkey BIGINT, c_name VARCHAR",
        "supplier": "s_suppkey BIGINT, s_name VARCHAR",
        "part": "p_partkey BIGINT",
        "orders": "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, o_orderdate DATE",
        "lineitem": (
            "l_orderkey BIGINT, l_returnflag VARCHAR, l_linestatus VARCHAR,"
            " l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE"
        ),
        "events": "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type VARCHAR, value DOUBLE, props VARCHAR",
        "documents": "doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT",
        "embeddings": "vec_id BIGINT, embedding FLOAT[], label INTEGER",
    }
    for t, cols in tables.items():
        con.execute(f"CREATE TABLE {t} ({cols})")
    for name, sql in m.oracle_sql().items():
        con.execute(f"EXPLAIN {sql}")  # raises on any syntax/binding error
