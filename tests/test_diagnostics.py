"""Extraction diagnostics (sources/diagnostics.py): per-run stats and
gap detection from filesystem metadata only — the Spark analog of the
reference's analyze_extraction.py (file counts/sizes per period,
missing-period gaps, resume recommendation)."""

from __future__ import annotations

import gzip
import os

from data_lake_skyfit_spark.sources.diagnostics import extraction_gaps, extraction_report


def _land(root: str, entity: str, day: str, run: str, parts: dict[str, bytes]):
    d = os.path.join(root, "bronze", "evo", f"entity={entity}",
                     f"ingestion_date={day}", f"run_id={run}")
    os.makedirs(d, exist_ok=True)
    for name, payload in parts.items():
        with open(os.path.join(d, name), "wb") as f:
            f.write(payload)


def test_extraction_report_counts_files_and_bytes(spark, tmp_path):
    root = str(tmp_path)
    p1 = gzip.compress(b'{"id": 1}\n')
    p2 = gzip.compress(b'{"id": 2}\n{"id": 3}\n')
    _land(root, "members", "2024-01-01", "r1", {"part-00000.jsonl.gz": p1})
    _land(root, "members", "2024-01-02", "r2",
          {"part-00000.jsonl.gz": p1, "part-00001.jsonl.gz": p2, "_SUCCESS": b""})
    got = {
        (r["ingestion_date"], r["run_id"]): (r["n_files"], r["total_bytes"])
        for r in extraction_report(spark, root, "evo", "members").collect()
    }
    assert got == {
        ("2024-01-01", "r1"): (1, len(p1)),
        # marker files (_SUCCESS) are not part files:
        ("2024-01-02", "r2"): (2, len(p1) + len(p2)),
    }


def test_extraction_gaps_and_resume_point(spark, tmp_path):
    root = str(tmp_path)
    part = {"part-00000.jsonl.gz": gzip.compress(b'{"id": 1}\n')}
    for day in ("2024-01-01", "2024-01-02", "2024-01-05"):
        _land(root, "members", day, "r1", part)
    got = extraction_gaps(spark, root, "evo", "members")
    assert got["first"] == "2024-01-01" and got["last"] == "2024-01-05"
    assert got["missing"] == ["2024-01-03", "2024-01-04"]
    assert got["resume_from"] == "2024-01-03"  # earliest gap wins


def test_extraction_gaps_complete_recommends_next_day(spark, tmp_path):
    root = str(tmp_path)
    part = {"part-00000.jsonl.gz": gzip.compress(b'{"id": 1}\n')}
    for day in ("2024-02-27", "2024-02-28", "2024-02-29"):
        _land(root, "members", day, "r1", part)
    got = extraction_gaps(spark, root, "evo", "members")
    assert got["missing"] == []
    assert got["resume_from"] == "2024-03-01"  # leap-year day handled


def test_extraction_report_empty_root(spark, tmp_path):
    assert extraction_report(spark, str(tmp_path), "evo", "members").count() == 0
    got = extraction_gaps(spark, str(tmp_path), "evo", "members")
    assert got["n_periods"] == 0 and got["resume_from"] is None


def test_extraction_gaps_tolerates_non_date_partitions(spark, tmp_path):
    """A NULL ingestion_date lands as __HIVE_DEFAULT_PARTITION__; the
    gap report must surface it, not crash on date parsing."""
    root = str(tmp_path)
    part = {"part-00000.jsonl.gz": gzip.compress(b'{"id": 1}\n')}
    for day in ("2024-01-01", "2024-01-02", "__HIVE_DEFAULT_PARTITION__"):
        _land(root, "members", day, "r1", part)
    got = extraction_gaps(spark, root, "evo", "members")
    assert got["first"] == "2024-01-01" and got["last"] == "2024-01-02"
    assert got["missing"] == []
    assert got["non_date_periods"] == ["__HIVE_DEFAULT_PARTITION__"]


def test_extraction_gaps_rejects_compact_iso_forms(spark, tmp_path):
    """Python 3.11 fromisoformat accepts '20240102'; the gap math is
    string-keyed so compact forms must be routed to non_date_periods,
    not silently mixed into the date range."""
    root = str(tmp_path)
    part = {"part-00000.jsonl.gz": gzip.compress(b'{"id": 1}\n')}
    for day in ("2024-01-01", "20240102", "2024-01-03", "2024-13-99"):
        _land(root, "members", day, "r1", part)
    got = extraction_gaps(spark, root, "evo", "members")
    assert got["first"] == "2024-01-01" and got["last"] == "2024-01-03"
    assert got["missing"] == ["2024-01-02"]
    assert got["non_date_periods"] == ["2024-13-99", "20240102"]


def test_bench_compact_line_fits_tail_budget():
    """The driver records only the last 2000 bytes of bench stdout —
    the emitted line must parse at any registry size, dropping fastest
    queries first."""
    import json

    import bench

    doc = {
        "metric": "skyfit_spark_query_battery_total",
        "value": 123.4567,
        "unit": "sec",
        "queries": {f"some_rather_long_query_name_{i:03d}": i / 10 for i in range(200)},
        "sf": 0.1,
    }
    line = bench.compact_line(doc, budget=1900)
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["metric"] == doc["metric"] and parsed["value"] == 123.46
    # slowest queries survive the cut
    kept = parsed["queries"]
    assert "some_rather_long_query_name_199" in kept
    assert parsed["queries_omitted"] == 200 - len(kept)
    # tiny registries emit everything, no omission marker
    small = dict(doc, queries={"a": 1.0, "b": 2.0})
    p2 = json.loads(bench.compact_line(small))
    assert "queries_omitted" not in p2 and len(p2["queries"]) == 2
