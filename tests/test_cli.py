"""CLI surface tests (reference R14 parity, src/bin/main.rs)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(*args: str):
    return subprocess.run(
        [sys.executable, "-m", "datalake_worker_spark.cli", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
        timeout=300,
    )


@pytest.mark.slow
def test_cli_lifecycle(tmp_path, sf_dir):
    root = str(tmp_path / "cat")
    nation = os.path.join(sf_dir, "nation.parquet")

    r = run_cli("--root", root, "register", "tpch", "nat01", "0", "100", nation, "--size", "25")
    assert r.returncode == 0 and "registered" in r.stdout, r.stderr[-2000:]

    r = run_cli("--root", root, "list-chunks")
    assert "nat01" in r.stdout

    r = run_cli("--root", root, "find", "tpch", "50")
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["chunk_id"] == "nat01" and out["block_end"] == 100

    r = run_cli("--root", root, "find", "tpch", "100")  # half-open end: miss
    assert r.returncode == 1

    r = run_cli("--root", root, "total-size")
    assert r.stdout.strip().splitlines()[-1] == "25"

    r = run_cli("--root", root, "query", "SELECT count(*) AS n FROM tpch_0")
    last = json.loads(r.stdout.strip().splitlines()[-1])
    assert last == {"n": 25}

    r = run_cli("--root", root, "schedule-delete", "nat01")
    assert r.returncode == 0

    r = run_cli("--root", root, "vacuum")
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["removed"] == ["nat01"]

    r = run_cli("--root", root, "list-chunks")
    assert "nat01" not in r.stdout


@pytest.mark.slow
def test_cli_tags(tmp_path, sf_dir):
    """tag / tags / list-chunks-at: the time-travel-by-name CLI surface."""
    root = str(tmp_path / "cat")
    nation = os.path.join(sf_dir, "nation.parquet")
    r = run_cli("--root", root, "register", "tpch", "c1", "0", "100", nation)
    assert r.returncode == 0, r.stderr
    r = run_cli("--root", root, "tag", "v1")
    assert r.returncode == 0 and json.loads(r.stdout.splitlines()[-1]) == {
        "tag": "v1", "version": 1,
    }, r.stdout + r.stderr
    r = run_cli("--root", root, "tag", "v1")  # immutable
    assert r.returncode == 1
    r = run_cli("--root", root, "register", "tpch", "c2", "100", "200", nation)
    assert r.returncode == 0, r.stderr
    r = run_cli("--root", root, "tags")
    assert json.loads(r.stdout.splitlines()[-1]) == {"v1": 1}
    r = run_cli("--root", root, "list-chunks-at", "v1")
    assert r.stdout.splitlines()[-1:] == ["c1"], r.stdout
    r = run_cli("--root", root, "list-chunks-at", "2")
    assert r.stdout.splitlines()[-2:] == ["c1", "c2"], r.stdout
    r = run_cli("--root", root, "list-chunks-at", "nope")
    assert r.returncode == 1
