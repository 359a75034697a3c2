"""The examples are documentation that must stay runnable: execute each
end-to-end as a subprocess (fresh interpreter, own SparkSession) and
assert clean exit + expected output markers."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script: str, *args: str) -> str:
    env = {**os.environ, "PYTHONPATH": REPO,
           "SPARK_GRAFT_CPUS": os.environ.get("SPARK_GRAFT_CPUS", "4")}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), *args],
        capture_output=True, text=True, timeout=600, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def test_llm_corpus_pipeline_example(tmp_path):
    out = _run("llm_corpus_pipeline.py", "/root/testdata/sf0.001",
               str(tmp_path / "corpus"))
    assert "gate drops:" in out and "corpus:" in out
    assert "classifier gate:" in out
    assert "token budget: kept" in out
    assert "nn audit:" in out
    assert "packed:" in out and "quantized:" in out
    assert "shard verify: ok=True (mismatches=0)" in out


def test_wp_migration_pipeline_example(tmp_path):
    out = _run("wp_migration_pipeline.py", str(tmp_path / "mig"))
    assert "migrated: posts=3 users=2" in out
    assert "after snapshot restore: 1 posts" in out


def test_continuous_dedup_loop_example(tmp_path):
    out = _run("continuous_dedup_loop.py", "/root/testdata/sf0.001",
               str(tmp_path / "stores"))
    assert "base=gen-" in out          # compaction really folded
    assert "base=<tail only>" in out   # and the pre-compaction regime ran
    assert "auto-compacted@" in out    # folded by the default policy
    assert "deleted [990001]" in out   # takedown demo ran
    assert "(re-admitted" in out       # and the re-ingest was admitted
    assert "purge_corpus: rewrote 1 partition(s), 1 row(s)" in out
    assert "(unchanged)" in out        # purge is storage-only
    assert "ann matches:" in out
