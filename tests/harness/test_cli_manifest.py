"""manifest subcommand: status table, --missing, --commands."""

import json

from benchmarks.harness.cli import main
from benchmarks.harness.registry import filter_permutations


def test_manifest_lists_all(capsys, tmp_path):
    main(["manifest", "--sizes", "500", "--results-dir", str(tmp_path)])
    out = capsys.readouterr()
    lines = out.out.strip().splitlines()
    assert all(l.startswith("missing") for l in lines)
    assert "complete" in out.err


def test_manifest_missing_excludes_done(capsys, tmp_path):
    perm = filter_permutations([500], treatment="embed")[0]
    d = tmp_path / perm.perm_id
    d.mkdir(parents=True)
    (d / "record.json").write_text(json.dumps({"records": []}))
    main(["manifest", "--sizes", "500", "--results-dir", str(tmp_path),
          "--missing"])
    out = capsys.readouterr().out
    assert perm.perm_id not in out
    main(["manifest", "--sizes", "500", "--results-dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert any(
        l.startswith("done") and perm.perm_id in l
        for l in out.splitlines()
    )


def test_manifest_commands_are_runnable_strings(capsys, tmp_path):
    main(["manifest", "--sizes", "500", "--results-dir", str(tmp_path),
          "--missing", "--commands"])
    out = capsys.readouterr().out.strip().splitlines()
    assert out
    assert all(
        l.startswith("python -m benchmarks.harness benchmark --id ")
        for l in out
    )
