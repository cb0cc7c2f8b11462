"""benchmark subcommand: runs one permutation, writes the artifact."""

import json

import pytest

from benchmarks.harness.cli import main
from benchmarks.harness.registry import filter_permutations, run_permutation


def test_benchmark_writes_artifact_and_jsonl(tmp_path, capsys):
    perm = filter_permutations([300], treatment="graph_vt")[0]
    out_path = tmp_path / "r.jsonl"
    main([
        "benchmark", "--id", perm.perm_id, "--sizes", "300",
        "--results-dir", str(tmp_path), "--out", str(out_path),
    ])
    art = json.loads((tmp_path / perm.perm_id / "record.json").read_text())
    assert art["permutation_id"] == perm.perm_id
    assert art["treatment"] == "graph_vt"
    assert art["records"] and art["wall_s"] > 0
    rec = art["records"][0]
    assert {"treatment", "permutation", "metrics", "wall_s",
            "peak_rss_mb", "platform", "ts"} <= set(rec)
    lines = [json.loads(l) for l in open(out_path)]
    assert len(lines) == len(art["records"])


def test_benchmark_unknown_id_errors(tmp_path):
    with pytest.raises(SystemExit):
        main(["benchmark", "--id", "no_such_perm",
              "--results-dir", str(tmp_path)])


def test_run_permutation_collects_records(tmp_path, rng):
    perm = filter_permutations([300], treatment="graph_community")[0]
    recs = run_permutation(perm, rng, out=None, results_dir=tmp_path)
    assert len(recs) == 1
    assert 0.0 <= recs[0].metrics["modularity"] <= 1.0
    assert (tmp_path / perm.perm_id / "record.json").exists()
