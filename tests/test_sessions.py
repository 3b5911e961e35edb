"""Gap-based sessionization — pure-Python oracle + edge cases."""

from __future__ import annotations

from datetime import datetime, timedelta

from tldr_spark.operators.sessions import session_stats, sessionize

T0 = datetime(2026, 1, 1, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + timedelta(seconds=s), t) for u, s, t in rows],
        "user_id long, ts timestamp, event_type string",
    )


def _sessions_py(rows, gap):
    by_user: dict[int, list[tuple[int, str]]] = {}
    for u, s, t in rows:
        by_user.setdefault(u, []).append((s, t))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        seq, prev = 0, None
        for s, _t in evs:
            if prev is None or s - prev > gap:
                seq += 1
            out.setdefault((u, seq), []).append(s)
            prev = s
    return out


ROWS = [
    (1, 0, "view"), (1, 100, "click"), (1, 2000, "view"),   # 2 sessions (gap 1800)
    (1, 2100, "buy"),
    (2, 0, "view"),                                          # singleton
    (3, 0, "view"), (3, 1800, "view"), (3, 3600, "view"),   # exactly-gap chains
    (3, 5401, "view"),                                       # gap+1 → breaks
]


def test_sessionize_matches_python(spark):
    per_event = sessionize(_ev(spark, ROWS), gap_seconds=1800).collect()
    assert len(per_event) == len(ROWS)  # one output row per event
    want = _sessions_py(ROWS, 1800)
    assert {(r["user_id"], r["session_seq"]) for r in per_event} == set(want)
    stats = {
        (r["user_id"], r["session_seq"]): r["n_events"]
        for r in session_stats(_ev(spark, ROWS), gap_seconds=1800).collect()
    }
    assert stats == {k: len(v) for k, v in want.items()}


def test_session_boundaries(spark):
    rows = session_stats(_ev(spark, ROWS), gap_seconds=1800).collect()
    by = {(r["user_id"], r["session_seq"]): r for r in rows}
    # user 1: [0,100] then [2000,2100]
    assert by[(1, 1)]["duration_us"] == 100_000_000 and by[(1, 1)]["n_events"] == 2
    assert by[(1, 2)]["duration_us"] == 100_000_000
    # user 3: gap == 1800 chains, 5401 breaks (gap 1801 > 1800)
    assert by[(3, 1)]["n_events"] == 3 and by[(3, 2)]["n_events"] == 1
    assert by[(2, 1)]["duration_us"] == 0
    assert by[(1, 1)]["n_event_types"] == 2


def test_random_differential(spark):
    x, rows = 99, []
    for _ in range(400):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        rows.append((int((x >> 8) % 7), int((x >> 32) % 50000), "e"))
    rows = sorted(set(rows))
    got = {
        (r["user_id"], r["session_seq"]): r["n_events"]
        for r in session_stats(_ev(spark, rows), gap_seconds=600).collect()
    }
    want = {k: len(v) for k, v in _sessions_py(rows, 600).items()}
    assert got == want


def test_reserved_column_collision_raises(spark):
    # ADVICE r3: silently overwriting a caller's ts_us / session_seq would
    # corrupt downstream joins — the operator must refuse loudly
    import pytest
    from pyspark.sql import functions as F

    base = _ev(spark, ROWS)
    for col in ("ts_us", "session_seq"):
        with pytest.raises(ValueError, match=col):
            sessionize(base.withColumn(col, F.lit(0)))
