"""Paginated-API extraction connectors (bronze ingestion tier).

Reproduces the reference's extractor semantics (SURVEY.md §2.1 S4-S7,
§3.1) Spark-first: the driver plans date-period partitions (I4), Spark
distributes the periods across executors, and each task runs the
pagination protocol against the source, emitting raw records that land
as partitioned bronze JSONL. The reference's ProcessPoolExecutor fan-out
(evo_members_bronze_parallel.py:340-346) becomes executor parallelism.

Pagination protocols:
- skip/take with date-range predicate pushed to the API (EVO,
  evo_members_bronze_parallel.py:160-220)            → paginate_skip_take
- opaque-cursor pages sorted by update_time (Pipedrive v2,
  pipedrive_bronze.py:95-113)                        → paginate_cursor
- next_page snapshot collections (Zendesk,
  zendesk_bronze.py:140-151)                         → paginate_next_page
- incremental cursor export with end_of_stream (Zendesk,
  zendesk_bronze.py:153-204)                         → incremental_cursor_export

Cross-cutting concerns, all per-task (per-executor) exactly like the
reference's per-worker state:
- RateLimiter: N requests/minute with a free window
  (evo_members_bronze_parallel.py:101-119)
- retry with exponential backoff on transient errors
  (ADR-006, load_evo_members_stg_fast_v2.py:281-313)

No HTTP client lives here — a fetcher is any callable, so tests (and
air-gapped runs) inject fakes while production injects requests/httpx.
"""

from __future__ import annotations

import time as _time
from collections.abc import Callable, Iterator, Sequence
from dataclasses import dataclass
from datetime import date, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "RateLimiter",
    "with_retry",
    "generate_periods",
    "paginate_skip_take",
    "paginate_cursor",
    "paginate_next_page",
    "incremental_cursor_export",
    "extract_periods_to_bronze",
    "land_bronze",
]


class RateLimiter:
    """requests-per-minute limiter with an optional free window (the
    reference's 40 rpm limit is waived 0h-5h local,
    evo_members_bronze_parallel.py:101-119). Clock injectable for
    deterministic tests."""

    def __init__(
        self,
        rpm: int = 40,
        *,
        free_hours: tuple[int, int] | None = (0, 5),
        clock: Callable[[], float] = _time.time,
        sleeper: Callable[[float], None] = _time.sleep,
    ):
        self.interval = 60.0 / rpm
        self.free_hours = free_hours
        self._clock = clock
        self._sleep = sleeper
        self._last = 0.0

    def _in_free_window(self, now: float) -> bool:
        if self.free_hours is None:
            return False
        hour = _time.localtime(now).tm_hour
        lo, hi = self.free_hours
        return lo <= hour < hi

    def acquire(self) -> float:
        """Block until a request slot is available; returns the wait."""
        now = self._clock()
        if self._in_free_window(now):
            self._last = now
            return 0.0
        wait = max(0.0, self._last + self.interval - now)
        if wait > 0:
            self._sleep(wait)
        self._last = now + wait
        return wait


def with_retry(
    fn: Callable,
    *,
    max_tries: int = 5,
    base_delay: float = 30.0,
    retryable: Callable[[Exception], bool] = lambda e: True,
    sleeper: Callable[[float], None] = _time.sleep,
):
    """Exponential-backoff wrapper: delay = base·2^attempt (ADR-006's
    30·2^n seconds, 5 tries). Non-retryable errors raise immediately."""

    def wrapped(*args, **kwargs):
        for attempt in range(max_tries):
            try:
                return fn(*args, **kwargs)
            except Exception as e:  # noqa: BLE001 — classified below
                if not retryable(e) or attempt == max_tries - 1:
                    raise
                sleeper(base_delay * (2**attempt))
        raise RuntimeError("unreachable")

    return wrapped


def generate_periods(
    start: date, end: date, *, days: int = 92
) -> list[tuple[str, str]]:
    """I4: split [start, end) into date chunks — quarters for members,
    months for sales, weeks for entries (generate_periods
    evo_members_bronze_parallel.py:262-278). Each period is one unit of
    distributed work and one unit of failure."""
    periods: list[tuple[str, str]] = []
    cur = start
    while cur < end:
        nxt = min(cur + timedelta(days=days), end)
        periods.append((cur.isoformat(), nxt.isoformat()))
        cur = nxt
    return periods


# -- pagination protocols (pure generators over an injected fetcher) --------


def paginate_skip_take(
    fetch: Callable[..., list[dict]],
    *,
    take: int = 50,
    limiter: RateLimiter | None = None,
    **params,
) -> Iterator[dict]:
    """S4: skip/take pagination; stops on a short/empty page. `params`
    carries the date-range predicate pushed down to the API
    (registerDateStart/End — evo_members_bronze_parallel.py:160-220)."""
    skip = 0
    while True:
        if limiter is not None:
            limiter.acquire()
        page = fetch(skip=skip, take=take, **params)
        if not page:
            return
        yield from page
        if len(page) < take:
            return
        skip += take


def paginate_cursor(
    fetch: Callable[..., dict],
    *,
    limiter: RateLimiter | None = None,
    **params,
) -> Iterator[dict]:
    """S5: opaque-cursor pages (Pipedrive v2: response carries
    next_cursor; None means done — pipedrive_bronze.py:95-113). The
    fetch contract: fetch(cursor=..., **params) ->
    {"items": [...], "next_cursor": str | None}."""
    cursor: str | None = None
    while True:
        if limiter is not None:
            limiter.acquire()
        resp = fetch(cursor=cursor, **params)
        yield from resp.get("items", ())
        cursor = resp.get("next_cursor")
        if not cursor:
            return


def paginate_next_page(
    fetch: Callable[..., dict],
    *,
    root_key: str,
    limiter: RateLimiter | None = None,
    **params,
) -> Iterator[dict]:
    """S6: next_page-URL snapshot pagination (Zendesk,
    zendesk_bronze.py:140-151). fetch(page_url=...) returns the decoded
    body; records live under `root_key`."""
    page_url: str | None = None
    while True:
        if limiter is not None:
            limiter.acquire()
        resp = fetch(page_url=page_url, **params)
        yield from resp.get(root_key, ())
        page_url = resp.get("next_page")
        if not page_url:
            return


def incremental_cursor_export(
    fetch: Callable[..., dict],
    *,
    start_time: int | None,
    cursor: str | None,
    root_key: str = "tickets",
    limiter: RateLimiter | None = None,
) -> tuple[list[dict], str | None]:
    """S7/I2: cursor-based change stream (Zendesk incremental export,
    zendesk_bronze.py:153-204): resume from a persisted cursor (or
    start_time on first run), drain until end_of_stream, return the
    records and the cursor to persist for the next run."""
    records: list[dict] = []
    while True:
        if limiter is not None:
            limiter.acquire()
        resp = fetch(start_time=start_time, cursor=cursor)
        records.extend(resp.get(root_key, ()))
        cursor = resp.get("after_cursor")
        start_time = None
        if resp.get("end_of_stream", True):
            return records, cursor


# -- distributed extraction --------------------------------------------------


@dataclass
class _PeriodTask:
    start: str
    end: str


def extract_periods_to_bronze(
    spark: SparkSession,
    periods: Sequence[tuple[str, str]],
    page_iter_factory: Callable[[str, str], Iterator[dict]],
    *,
    max_parallelism: int | None = None,
) -> DataFrame:
    """Fan periods out across executors; each task drains its period's
    page iterator and emits raw JSON records (§3.1 step 3-4: the
    ProcessPoolExecutor worker becomes a Spark task; failure granularity
    stays one period via task retries).

    Returns a DataFrame (period_start, period_end, raw_json) ready for
    `from_json` + bronze landing. One period == one input partition, so
    slow periods don't block fast ones and stragglers re-run alone.
    """
    import json

    n = max_parallelism or len(periods) or 1

    def run_period(rows) -> Iterator:
        for row in rows:
            for rec in page_iter_factory(row.start, row.end):
                yield (row.start, row.end, json.dumps(rec))

    pdf = spark.createDataFrame(
        [_PeriodTask(s, e) for s, e in periods], "start string, end string"
    ).repartition(min(n, max(len(periods), 1)))
    out = pdf.rdd.mapPartitions(run_period)
    return spark.createDataFrame(
        out, "period_start string, period_end string, raw_json string"
    )


def land_bronze(
    extracted: DataFrame,
    root: str,
    source: str,
    entity: str,
    run_id: str,
    *,
    ingestion_date: str,
    scope: str | None = None,
) -> None:
    """Write extracted raw records as partitioned bronze JSONL parts —
    the K1 gzipped part-writer with Spark handling buffering and part
    sizing. The payload lands VERBATIM (text lines, not re-serialized):
    bronze stores exactly what the API returned (ADR-002)."""
    from .bronze import bronze_path

    df = extracted.select(
        F.col("raw_json").alias("value"),
        F.lit(entity).alias("entity"),
        F.lit(ingestion_date).alias("ingestion_date"),
        F.lit(run_id).alias("run_id"),
        *([F.lit(scope).alias("scope")] if scope else []),
    )
    parts = [c for c in ("scope", "entity", "ingestion_date", "run_id") if c in df.columns]
    (
        df.write.mode("append")
        .option("maxRecordsPerFile", 100_000)
        .option("compression", "gzip")
        .partitionBy(*parts)
        .text(bronze_path(root, source))
    )
