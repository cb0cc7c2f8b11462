"""The every-row-wins invariant for the same-machine head-to-head
(round-4 VERDICT task #10): the committed JSONL is latest-per-(op, n)
and every gated row clears 1x; ``analyse`` enforces it."""

import json
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[2]
JSONL = ROOT / "benchmarks" / "results" / "same_machine.jsonl"


def _rows():
    return [json.loads(ln) for ln in JSONL.read_text().splitlines() if ln]


def test_committed_jsonl_is_compacted():
    """One row per (op, n): no consumer needs to dedupe (stale
    superseded rows used to accumulate — VERDICT r4 Weak #6)."""
    rows = _rows()
    keys = [(r["op"], r["n"]) for r in rows]
    assert len(keys) == len(set(keys)), (
        "duplicate (op, n) rows in same_machine.jsonl — run "
        "benchmarks.ref_same_machine (it compacts on exit)"
    )


def test_every_gated_row_wins():
    """Every gated latest row has speedup >= 1x or a reference
    timeout — the CI-checked form of the published claim."""
    from benchmarks.ref_same_machine import check_all_rows_win

    bad = check_all_rows_win(_rows())
    assert not bad, bad


def test_gate_catches_a_losing_row(tmp_path):
    """The gate itself fails on a sub-1x gated row and ignores
    ungated context rows."""
    from benchmarks.charts import check_same_machine_gate

    p = tmp_path / "sm.jsonl"
    rows = [
        {"op": "bfs", "n": 100, "ref_ms": 1.0, "ref_timeout": False,
         "ours_ms": 2.0, "speedup": 0.5, "ts": 1.0},
        {"op": "vss_query_hostcpu", "n": 100, "ref_ms": 1.0,
         "ref_timeout": False, "ours_ms": 9.0, "speedup": 0.11,
         "gated": False, "ts": 1.0},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    bad = check_same_machine_gate(str(p))
    assert len(bad) == 1 and "bfs" in bad[0], bad


def test_gate_dedupes_superseded_rows(tmp_path):
    """A newer winning row supersedes an older losing one even if a
    stale file still contains both."""
    from benchmarks.charts import check_same_machine_gate

    p = tmp_path / "sm.jsonl"
    rows = [
        {"op": "bfs", "n": 100, "ref_ms": 1.0, "ref_timeout": False,
         "ours_ms": 2.0, "speedup": 0.5, "ts": 1.0},
        {"op": "bfs", "n": 100, "ref_ms": 1.0, "ref_timeout": False,
         "ours_ms": 0.5, "speedup": 2.0, "ts": 2.0},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    assert check_same_machine_gate(str(p)) == []


def test_compaction_archives_history(tmp_path):
    from benchmarks.ref_same_machine import (
        check_all_rows_win, compact_results,
    )

    p = tmp_path / "sm.jsonl"
    rows = [
        {"op": "bfs", "n": 100, "ref_ms": 1.0, "ref_timeout": False,
         "ours_ms": 2.0, "speedup": 0.5, "ts": 1.0},
        {"op": "bfs", "n": 100, "ref_ms": 1.0, "ref_timeout": False,
         "ours_ms": 0.5, "speedup": 2.0, "ts": 2.0},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    kept = compact_results(p)
    assert len(kept) == 1 and kept[0]["speedup"] == 2.0
    hist = tmp_path / "archive" / "sm_history.jsonl"
    assert hist.exists()
    assert len(hist.read_text().splitlines()) == 2
    assert check_all_rows_win(kept) == []
