"""Continuous verification of the binary-extracted AV1 default
tables: re-run the structural extraction against the in-container
libaom/libgav1 binaries and assert the committed module matches
exactly (the r7/r8 discipline — the extraction IS the pin, and this
test keeps it live every round)."""

from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np
import pytest

from data_lake_skyfit_spark.llm import av1_tables

_AOM = "/lib/x86_64-linux-gnu/libaom.so.3"
_GAV1 = "/lib/x86_64-linux-gnu/libgav1.so.1"

needs_bins = pytest.mark.skipif(
    not (os.path.exists(_AOM) and os.path.exists(_GAV1)),
    reason="AV1 reference binaries absent")

_NAMES = [n for n in dir(av1_tables) if n.isupper()]


def test_tables_well_formed():
    assert len(_NAMES) == 23
    total = 0
    for n in _NAMES:
        arr = getattr(av1_tables, n)
        total += arr.size
        if n.endswith("QLOOKUP"):
            assert arr.shape == (256,)
            assert arr[0] == 4 and (np.diff(arr.astype(np.int32)) >= 0).all()
        else:
            flat = arr.reshape(-1)
            assert (flat < 32768).all()
    assert total == 20488


def test_cdf_rows_monotone():
    for n in _NAMES:
        if n.endswith("QLOOKUP"):
            continue
        arr = getattr(av1_tables, n)
        rows = arr.reshape(-1, arr.shape[-1])
        for row in rows:
            nz = row[row > 0]
            # each CDF's nonzero prefix is non-increasing
            if len(nz) > 1:
                assert (nz[:-1] >= nz[1:]).all(), (n, list(row))


@needs_bins
def test_extraction_reproduces_committed_module(tmp_path):
    """Re-run .claude/av1_extract.py into a scratch module and diff
    every table against the committed one."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, ".claude", "av1_extract.py")
    out = tmp_path / "av1_tables_fresh.py"
    import subprocess

    env = dict(os.environ)
    code = open(script).read().replace(
        'path = "data_lake_skyfit_spark/llm/av1_tables.py"',
        f'path = r"{out}"')
    proc = subprocess.run([sys.executable, "-c", code], cwd=repo,
                          capture_output=True, text=True, env=env,
                          timeout=1200)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    spec = importlib.util.spec_from_file_location("fresh", out)
    fresh = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fresh)
    for n in _NAMES:
        a = getattr(av1_tables, n)
        b = getattr(fresh, n)
        assert a.shape == b.shape, n
        assert (a == b).all(), n
