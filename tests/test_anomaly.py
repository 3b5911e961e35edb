"""Hourly burst detection — python oracle + boundary semantics."""

from __future__ import annotations

import datetime as dt
import math

from tldr_spark.operators.anomaly import hourly_bursts

BASE = dt.datetime(2024, 1, 1)


def _events(counts):
    """counts[h] events inside hour h."""
    rows = []
    for h, c in enumerate(counts):
        for i in range(c):
            rows.append((len(rows), BASE + dt.timedelta(hours=h, seconds=i)))
    return rows


def _oracle(counts):
    obs = [c for c in counts if c > 0]
    n, S, S2 = len(obs), sum(obs), sum(c * c for c in obs)
    out = {}
    for h, c in enumerate(counts):
        if c == 0:
            continue
        dev = n * c - S
        var_n2 = n * S2 - S * S
        burst = 1 if (dev > 0 and dev * dev > 4 * var_n2) else 0
        z = round(dev / math.sqrt(var_n2) * 1048576) if var_n2 > 0 else 0
        epoch = int((BASE + dt.timedelta(hours=h)).replace(
            tzinfo=dt.timezone.utc).timestamp())
        out[epoch] = (c, burst, z)
    return out


def _run(spark, counts):
    df = spark.createDataFrame(_events(counts), "event_id long, ts timestamp")
    return {
        r.hour_epoch: (r.n_events, r.burst, r.z_q)
        for r in hourly_bursts(df).collect()
    }


def test_spike_flagged_baseline_not(spark):
    counts = [10] * 12 + [100] + [10] * 11
    got = _run(spark, counts)
    want = _oracle(counts)
    assert got == want
    flagged = [v for v in got.values() if v[1] == 1]
    assert len(flagged) == 1 and flagged[0][0] == 100


def test_uniform_series_has_no_bursts(spark):
    counts = [7] * 24
    got = _run(spark, counts)
    assert all(v == (7, 0, 0) for v in got.values())


def test_zero_hours_absent_and_oracle_parity(spark):
    counts = [5, 0, 5, 0, 40, 5, 5]
    got = _run(spark, counts)
    assert len(got) == 5  # sparse: zero hours form no rows
    assert got == _oracle(counts)


def test_exact_two_sigma_boundary_not_flagged(spark):
    # counts {1,1,9,9}: mean 5, sigma_pop 4 -> threshold 13; c=9 is inside.
    # strict inequality: a point exactly AT mean+2sigma must not flag.
    counts = [1, 1, 9, 9]
    got = _run(spark, counts)
    assert all(v[1] == 0 for v in got.values())
    # a population z-score is bounded by sqrt(n-1), so a lone spike needs
    # n > 5 hours to ever clear 2 sigma; with 9 baseline hours it does.
    counts2 = [1] * 9 + [30]
    got2 = _run(spark, counts2)
    assert got2 == _oracle(counts2)
    assert sum(v[1] for v in got2.values()) == 1
