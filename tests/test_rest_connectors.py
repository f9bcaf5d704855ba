"""Extraction-tier tests (SURVEY.md §2.1 S4-S7, §3.1): pagination
protocols against fake APIs, rate limiting, retry/backoff, period
planning, and the distributed extract → bronze → STG round trip.
"""

from __future__ import annotations

from datetime import date

import pytest

from pyspark.sql import functions as F

from data_lake_skyfit_spark.sources import bronze, rest


# ---------------------------------------------------------------------------
# Unit: rate limiter / retry / periods
# ---------------------------------------------------------------------------


def test_rate_limiter_spacing():
    clock = {"t": 1000.0}
    waits: list[float] = []

    def fake_sleep(s):
        waits.append(s)
        clock["t"] += s

    rl = rest.RateLimiter(
        rpm=60, free_hours=None, clock=lambda: clock["t"], sleeper=fake_sleep
    )
    rl.acquire()  # first call free
    rl.acquire()  # must wait ~1s (60 rpm)
    assert waits and abs(waits[0] - 1.0) < 1e-6


def test_retry_backoff_then_success():
    calls = {"n": 0}
    delays: list[float] = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("transient")
        return "ok"

    wrapped = rest.with_retry(
        flaky, max_tries=5, base_delay=1.0, sleeper=delays.append
    )
    assert wrapped() == "ok"
    assert delays == [1.0, 2.0]  # 1·2^0, 1·2^1


def test_retry_non_retryable_raises_immediately():
    def bad():
        raise ValueError("schema error")

    wrapped = rest.with_retry(
        bad, retryable=lambda e: isinstance(e, ConnectionError), sleeper=lambda s: None
    )
    with pytest.raises(ValueError):
        wrapped()


def test_generate_periods_quarters():
    ps = rest.generate_periods(date(2024, 1, 1), date(2024, 12, 31), days=92)
    assert ps[0] == ("2024-01-01", "2024-04-02")
    assert ps[-1][1] == "2024-12-31"
    # contiguous, no overlap:
    assert all(ps[i][1] == ps[i + 1][0] for i in range(len(ps) - 1))


# ---------------------------------------------------------------------------
# Unit: pagination protocols over fakes
# ---------------------------------------------------------------------------


def test_paginate_skip_take():
    data = [{"id": i} for i in range(125)]

    def fetch(skip, take, **params):
        assert params == {"registerDateStart": "2024-01-01"}
        return data[skip : skip + take]

    out = list(
        rest.paginate_skip_take(fetch, take=50, registerDateStart="2024-01-01")
    )
    assert out == data  # 3 pages: 50+50+25 (short page stops)


def test_paginate_cursor():
    pages = {
        None: {"items": [{"id": 1}, {"id": 2}], "next_cursor": "c2"},
        "c2": {"items": [{"id": 3}], "next_cursor": None},
    }
    out = list(rest.paginate_cursor(lambda cursor, **p: pages[cursor]))
    assert [r["id"] for r in out] == [1, 2, 3]


def test_paginate_next_page():
    pages = {
        None: {"users": [{"id": 1}], "next_page": "p2"},
        "p2": {"users": [{"id": 2}], "next_page": None},
    }
    out = list(
        rest.paginate_next_page(lambda page_url, **p: pages[page_url], root_key="users")
    )
    assert [r["id"] for r in out] == [1, 2]


def test_incremental_cursor_export_resumes():
    stream = {
        (1700000000, None): {"tickets": [{"id": 1}], "after_cursor": "a", "end_of_stream": False},
        (None, "a"): {"tickets": [{"id": 2}], "after_cursor": "b", "end_of_stream": True},
        (None, "b"): {"tickets": [], "after_cursor": "b", "end_of_stream": True},
    }

    def fetch(start_time, cursor):
        return stream[(start_time, cursor)]

    recs, cur = rest.incremental_cursor_export(
        fetch, start_time=1700000000, cursor=None
    )
    assert [r["id"] for r in recs] == [1, 2] and cur == "b"
    # next run resumes from the persisted cursor (I2):
    recs2, cur2 = rest.incremental_cursor_export(fetch, start_time=None, cursor="b")
    assert recs2 == [] and cur2 == "b"


# ---------------------------------------------------------------------------
# Distributed extraction → bronze landing → partition-pruned read
# ---------------------------------------------------------------------------


def test_extract_periods_to_bronze_roundtrip(spark, tmp_path):
    root = str(tmp_path)
    periods = rest.generate_periods(date(2024, 1, 1), date(2024, 7, 1), days=92)

    def page_iter(start: str, end: str):
        # fake API: 30 records per period, skip/take paginated
        recs = [
            {"idMember": f"{start}-{i}", "registerDate": start, "v": i}
            for i in range(30)
        ]

        def fetch(skip, take, **p):
            return recs[skip : skip + take]

        return rest.paginate_skip_take(fetch, take=12)

    extracted = rest.extract_periods_to_bronze(spark, periods, page_iter)
    rest.land_bronze(
        extracted, root, "evo", "members", "20240701T000000",
        ingestion_date="2024-07-01",
    )

    df = bronze.read_bronze(spark, root, "evo", entity="members")
    assert df.count() == len(periods) * 30
    assert df.filter(F.col("run_id") == "20240701T000000").count() == len(periods) * 30
    # payload fields parsed from the verbatim JSON lines:
    assert "idMember" in df.columns
    assert df.filter(F.col("idMember") == "2024-01-01-5").count() == 1
    # gzip parts on disk under hive-style prefixes (K1 layout):
    import glob

    parts = glob.glob(
        f"{root}/bronze/evo/entity=members/ingestion_date=*/run_id=*/part-*.gz"
    )
    assert parts
