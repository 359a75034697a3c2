"""Pipeline layer tests: YAML !include, DAG validation, job filters,
dry-run, analyze, and an end-to-end CSV → transforms → JSON + ledger job
(the reference's full lifecycle, SURVEY §3)."""

from __future__ import annotations

import json

import pytest

from wp_etl_migration_spark.plans.config import dot_get, load_yaml
from wp_etl_migration_spark.plans.pipeline import (
    JobConfig, PipelineConfigError, select_jobs, validate_dag)
from wp_etl_migration_spark.plans.runner import Runner
from wp_etl_migration_spark.sinks.ledger import read_latest_ledger


# ----------------------------------------------------------------- config

def test_yaml_include_and_dot_get(tmp_path):
    (tmp_path / "inner.yaml").write_text("adapter: csv\nsource: x.csv\n")
    (tmp_path / "main.yaml").write_text(
        "name: demo\nmigration:\n  - name: j1\n    extract: !include inner.yaml\n")
    cfg = load_yaml(str(tmp_path / "main.yaml"))
    assert dot_get(cfg, "migration.0.extract.adapter") == "csv"
    assert dot_get(cfg, "migration.0.extract.missing", "dflt") == "dflt"


# -------------------------------------------------------------------- DAG

def _jobs(*specs):
    return [JobConfig.from_dict(dict(s)) for s in specs]


def test_dag_unknown_dependency():
    with pytest.raises(PipelineConfigError, match="unknown job"):
        validate_dag(_jobs({"name": "a", "depends_on": "ghost"}))


def test_dag_order_violation():
    with pytest.raises(PipelineConfigError, match="declared after"):
        validate_dag(_jobs({"name": "a", "depends_on": "b"}, {"name": "b"}))


def test_dag_duplicate_names():
    with pytest.raises(PipelineConfigError, match="duplicate"):
        validate_dag(_jobs({"name": "a"}, {"name": "a"}))


def test_dag_ok_chain():
    validate_dag(_jobs({"name": "a"}, {"name": "b", "depends_on": "a"},
                       {"name": "c", "depends_on": "b"}))


def test_select_jobs_filters():
    jobs = _jobs({"name": "a"}, {"name": "b", "skip": True}, {"name": "c"})
    assert [j.name for j in select_jobs(jobs)] == ["a", "c"]
    assert [j.name for j in select_jobs(jobs, include=["c"])] == ["c"]
    assert [j.name for j in select_jobs(jobs, skip=["a"])] == ["c"]
    with pytest.raises(PipelineConfigError):
        select_jobs(jobs, include=["nope"])


# ------------------------------------------------------------- end-to-end

MIGRATION = """
name: demo
migration:
  - name: articles
    extract:
      adapter: csv
      source: "{src}"
      prefix: "legacy."
    transform:
      - slugify: {{column: legacy.title, into: post.post_name}}
      - with_column: {{name: post.post_title, expr: "`legacy.title`"}}
      - nullif: {{column: legacy.author, value: "unknown"}}
      - with_column: {{name: ledger.source_id, expr: "`legacy.id`"}}
    load:
      - adapter: json
        destination: "{out}/articles.json"
        prefix: "post."
      - adapter: ledger
  - name: downstream
    depends_on: articles
    skip: true
    extract:
      adapter: csv
      source: "{src}"
"""


@pytest.fixture()
def project(tmp_path):
    src = tmp_path / "articles.csv"
    src.write_text("id,Title,Author\n1,Hello World,alice\n"
                   "2,Second Post,unknown\n")
    cfg = tmp_path / "migration.yaml"
    cfg.write_text(MIGRATION.format(src=src, out=tmp_path))
    return tmp_path, cfg


def test_runner_end_to_end(spark, project, tmp_path):
    root, cfg = project
    runner = Runner(spark, str(cfg), output_dir=str(root))
    reports = runner.run()
    assert [r.name for r in reports] == ["articles"]  # skip honored

    out = spark.read.json(str(root / "articles.json"))
    got = {r["post_name"]: r["post_title"] for r in out.collect()}
    assert got == {"hello-world": "Hello World",
                   "second-post": "Second Post"}
    # Prefix filter stripped the namespace and dropped legacy/ledger cols.
    assert sorted(out.columns) == ["post_name", "post_title"]

    ledger = read_latest_ledger(spark, str(root), "articles")
    assert ledger.count() == 2
    assert sorted(ledger.columns) == ["source_id", "uid"]


CURATION = """
name: curation
migration:
  - name: corpus
    extract:
      adapter: csv
      source: "{src}"
      prefix: ""
    transform:
      - scrub_pii: {{column: text}}
      - lang_id: {{column: text}}
      - exact_dedup: {{key: id, columns: [text]}}
      - gopher_gate: {{column: text, min_words: 3, min_stopword_hits: 1}}
      - hash_sample: {{key: id, fraction: 1.0, salt: v1}}
    load:
      - adapter: json
        destination: "{out}/corpus.json"
"""


def test_runner_llm_transforms(spark, tmp_path):
    """The curation operators are YAML-drivable like any reference-style
    transform step."""
    src = tmp_path / "docs.csv"
    src.write_text(
        "id,text\n"
        "1,the cat and the hat went to town\n"
        "2,the cat and the hat went to town\n"       # exact dup of 1
        "3,mail me at bob@example.com and the rest of this\n"
        "4,x\n")                                      # fails min_words
    cfg = tmp_path / "curation.yaml"
    cfg.write_text(CURATION.format(src=src, out=tmp_path))
    Runner(spark, str(cfg), output_dir=str(tmp_path)).run()
    out = spark.read.json(str(tmp_path / "corpus.json"))
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {1, 3}  # dup 2 dropped, 4 gated
    assert "<EMAIL>" in rows[3]["text"]
    assert rows[1]["lang_pred"] == "en"


def test_runner_dry_run_no_outputs(spark, project):
    root, cfg = project
    runner = Runner(spark, str(cfg), output_dir=str(root))
    reports = runner.run(dry_run=True)
    assert [r.name for r in reports] == ["articles"]
    assert not (root / "articles.json").exists()


def test_runner_analyze_counts(spark, project):
    root, cfg = project
    runner = Runner(spark, str(cfg), output_dir=str(root))
    reports = runner.analyze()
    assert [(r.name, r.rows) for r in reports] == [("articles", 2)]


def test_incremental_extract_skips_ledgered_rows(spark, tmp_path):
    """CDC-style re-run: rows already recorded in the job's own ledger
    are anti-joined away; a new source row still flows through."""
    src = tmp_path / "inc.csv"
    src.write_text("id,Title\n1,A\n2,B\n")
    cfg = tmp_path / "m.yaml"
    cfg.write_text(f"""
migration:
  - name: incjob
    extract:
      adapter: csv
      source: "{src}"
      incremental_key: {{source: legacy.id, ledger: source_id}}
    transform:
      - with_column: {{name: ledger.source_id, expr: "`legacy.id`"}}
      - with_column: {{name: post.post_title, expr: "`legacy.title`"}}
    load:
      - adapter: json
        destination: "{tmp_path}/inc.json"
        prefix: "post."
      - adapter: ledger
""")
    runner = Runner(spark, str(cfg), output_dir=str(tmp_path))
    runner.run()
    assert spark.read.json(str(tmp_path / "inc.json")).count() == 2

    # Re-run with one new source row: only id=3 survives the extract.
    src.write_text("id,Title\n1,A\n2,B\n3,C\n")
    runner2 = Runner(spark, str(cfg), output_dir=str(tmp_path))
    out = runner2.extract(runner2.jobs[0])
    assert [r["legacy.id"] for r in out.collect()] == [3]
    runner2.run()
    titles = {r["post_title"] for r in
              spark.read.json(str(tmp_path / "inc.json")).collect()}
    assert titles == {"C"}   # overwrite sink holds only the delta batch


def test_pipeline_class_lifecycle(spark, project):
    """§2.10 class plugin: prepare → run → finalize over the job frame."""
    from pyspark.sql import functions as F
    from wp_etl_migration_spark.plans.runner import (
        Runner, TransformPipeline, register_pipeline)

    calls = []

    @register_pipeline("tagger")
    class Tagger(TransformPipeline):
        def prepare(self, df):
            calls.append("prepare")
            return df.withColumn("stage", F.lit("prepared"))

        def run(self, df):
            calls.append("run")
            return df.withColumn("stage", F.lit("ran"))

        def finalize(self, df):
            calls.append("finalize")
            return df.withColumn("stage", F.lit("done"))

    root, cfg = project
    runner = Runner(spark, str(cfg), output_dir=str(root))
    runner.jobs[0].transform = [{"pipeline": "tagger"}]
    df = runner.compose(runner.jobs[0])
    assert calls == ["prepare", "run", "finalize"]
    assert df.select("stage").distinct().collect()[0][0] == "done"


def test_yaml_job_uses_canned_preset(spark, project):
    """The canned presets register themselves on runner import, so a
    YAML job can reference `pipeline: wordpress_post` directly (≙ the
    reference shipping WordPressPostPipeline as a ready-made FQCN)."""
    from pyspark.sql import functions as F
    from wp_etl_migration_spark.plans.runner import Runner

    root, cfg = project
    runner = Runner(spark, str(cfg), output_dir=str(root))
    runner.jobs[0].transform = [
        {"with_column": {"name": "post.post_title",
                         "expr": "`legacy.title`"}},
        {"pipeline": "wordpress_post"},
    ]
    df = runner.compose(runner.jobs[0])
    assert "post.post_type" in df.columns
    assert "post.post_name" in df.columns
    r = df.select(F.col("`post.post_type`").alias("t"),
                  F.col("`post.post_status`").alias("s"),
                  F.col("`post.post_title`").alias("ti"),
                  F.col("`post.post_name`").alias("slug"),
                  F.col("`legacy.title`").alias("src")).first()
    assert r.t == "post" and r.s == "draft"
    # the mapped title flowed through the preset (sanitized), and the
    # slug derived from it — not from the 'Default post title' default
    assert r.ti == r.src.strip()
    assert r.slug != "default-post-title" and r.slug
    assert df.select("`meta.etl_pipeline`").first()[0] == \
        "WordPressPostPipeline"


def test_cli_extract_with_transform(spark, project, capsys):
    from wp_etl_migration_spark.__main__ import main
    root, cfg = project
    assert main(["extract", str(cfg), "articles",
                 "--output-dir", str(root), "--with-transform",
                 "--file", str(root / "tx.json")]) == 0
    out = spark.read.json(str(root / "tx.json"))
    assert "post.post_name" in out.columns


def test_runner_invalid_transform(spark, project):
    root, cfg = project
    runner = Runner(spark, str(cfg), output_dir=str(root))
    runner.jobs[0].transform = [{"bogus": {}}]
    with pytest.raises(ValueError, match="unknown transform"):
        runner.run()
