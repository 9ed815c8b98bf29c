"""Smoke tests for the command-line surface (__main__.py)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _run(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "redis_dataflow_realtime_analytics_spark", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )


def test_cli_list():
    out = _run("list")
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.strip()]
    assert len(lines) >= 100
    assert any("sql-oracle" in l for l in lines)
    assert any("rows-only" in l for l in lines)


def test_cli_run_csv():
    out = _run(
        "run", "w1_visits_per_minute",
        "--sf-dir", "/root/testdata/sf0.001", "--limit", "3", "--format", "csv",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = out.stdout.strip().splitlines()
    assert lines[0] == "minute,visits"
    assert len(lines) == 4


def test_cli_explain():
    out = _run("explain", "q6_forecast_revenue", "--sf-dir", "/root/testdata/sf0.001")
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Physical Plan" in out.stdout
    assert "PushedFilters" in out.stdout
