"""Source adapter tests (SURVEY §2.1): CSV, JSON (JSONL + array), XML
(Spark 4 native rowTag reader), in-memory rows, and the multi-page
union-merge + limit patterns."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame

from wp_etl_migration_spark.sources import files as fsrc
from wp_etl_migration_spark.sources.memory import from_rows

RSS = """<?xml version="1.0"?>
<rss version="2.0">
  <channel>
    <title>Feed</title>
    <item><title>First post</title><guid>g1</guid><pos>1</pos></item>
    <item><title>Second post</title><guid>g2</guid><pos>2</pos></item>
  </channel>
</rss>
"""


def test_xml_rowtag_scan(spark, tmp_path):
    p = tmp_path / "feed.xml"
    p.write_text(RSS)
    df = fsrc.from_xml(spark, str(p), row_tag="item")
    rows = {r["guid"]: (r["title"], r["pos"]) for r in df.collect()}
    assert rows == {"g1": ("First post", 1), "g2": ("Second post", 2)}


RSS_WITH_DECOY = """\
<rss version="2.0">
  <channel>
    <title>Feed</title>
    <item><title>Real one</title><guid>g1</guid><pos>1</pos></item>
    <extras>
      <item><title>Decoy depth-4</title><guid>bad1</guid><pos>9</pos></item>
    </extras>
    <item><title>Real two</title><guid>g2</guid><pos>2</pos></item>
  </channel>
  <sidebar>
    <item><title>Decoy sidebar</title><guid>bad2</guid><pos>8</pos></item>
  </sidebar>
</rss>
"""


def test_xml_node_path_anchoring(spark, tmp_path):
    """node_path selects only rss/channel/item — decoy <item> tags at
    other depths (rss/channel/extras/item, rss/sidebar/item) are
    excluded, unlike the bare rowTag scan which matches any depth."""
    p = tmp_path / "decoy.xml"
    p.write_text(RSS_WITH_DECOY)
    anchored = fsrc.from_xml(spark, str(p),
                             node_path="rss/channel/item")
    assert sorted(r["guid"] for r in anchored.collect()) == ["g1", "g2"]
    # Bare rowTag really does match every depth (the behavior node_path
    # exists to fix) — guards against this test passing vacuously.
    loose = fsrc.from_xml(spark, str(p), row_tag="item")
    assert loose.count() == 4


def test_xml_node_path_single_segment_and_missing_arg(spark, tmp_path):
    import pytest

    p = tmp_path / "feed2.xml"
    p.write_text(RSS)
    # Single-segment node_path degrades to a rowTag scan.
    df = fsrc.from_xml(spark, str(p), node_path="item")
    assert df.count() == 2
    with pytest.raises(ValueError, match="row_tag or node_path"):
        fsrc.from_xml(spark, str(p))


def test_json_jsonl_and_array(spark, tmp_path):
    jl = tmp_path / "rows.jsonl"
    jl.write_text('{"id": 1, "t": "a"}\n{"id": 2, "t": "b"}\n')
    assert fsrc.from_json(spark, str(jl)).count() == 2

    arr = tmp_path / "doc.json"
    arr.write_text('[{"id": 1}, {"id": 2}, {"id": 3}]')
    assert fsrc.from_json(spark, str(arr), multi_line=True).count() == 3


def test_csv_schema_inference(spark, tmp_path):
    p = tmp_path / "d.csv"
    p.write_text("id,name,score\n1,a,1.5\n2,b,2.5\n")
    df = fsrc.from_csv(spark, str(p))
    assert dict(df.dtypes) == {"id": "int", "name": "string",
                               "score": "double"}


def test_memory_rows(spark):
    df = from_rows(spark, [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
    assert df.count() == 2 and sorted(df.columns) == ["a", "b"]


def test_multipage_union_merge(spark, tmp_path):
    """S5 RSS multi-page: N page scans merged lazily
    (≙ Extract Orchestrator.php:173-227, without its eager to_array)."""
    pages = []
    for i in range(3):
        p = tmp_path / f"page{i}.xml"
        p.write_text(RSS.replace("g1", f"g1-{i}").replace("g2", f"g2-{i}"))
        pages.append(fsrc.from_xml(spark, str(p), row_tag="item"))
    merged = reduce(DataFrame.unionByName, pages)
    assert merged.count() == 6
    assert merged.select("guid").distinct().count() == 6


def test_limit_pushdown_plan(spark, tmp_path):
    """S11 Limitable/STOP ≙ df.limit — Catalyst plants a LocalLimit at
    the scan instead of reading everything."""
    df = fsrc.from_parquet(spark, "/root/testdata/sf0.001/orders.parquet")
    plan = df.limit(7)._jdf.queryExecution().executedPlan().toString()
    assert "Limit" in plan or "CollectLimit" in plan
    assert len(df.limit(7).collect()) == 7


def test_json_quarantine_split(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text('{"id": 1, "name": "a"}\n'
                 'this is not json\n'
                 '{"id": 2, "name": "b"}\n')
    clean, corrupt = fsrc.from_json_with_quarantine(
        spark, str(p), "id BIGINT, name STRING")
    assert sorted((r.id, r.name) for r in clean.collect()) == \
        [(1, "a"), (2, "b")]
    assert [r.raw for r in corrupt.collect()] == ["this is not json"]


def test_csv_quarantine_split(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,name\n1,a\nnot-a-number,b\n2,c\n")
    clean, corrupt = fsrc.from_csv_with_quarantine(
        spark, str(p), "id BIGINT, name STRING")
    assert sorted((r.id, r.name) for r in clean.collect()) == \
        [(1, "a"), (2, "c")]
    assert [r.raw for r in corrupt.collect()] == ["not-a-number,b"]


def test_orc_roundtrip_pushdown_and_partitioning(spark, tmp_path):
    """ORC source/sink: round-trip fidelity, predicate pushdown +
    column pruning reaching the scan, and hive-partitioned writes
    pruned at the listing — the same Catalyst treatment the parquet
    path gets."""
    from pyspark.sql import functions as F

    from wp_etl_migration_spark.sinks.files import write_orc
    from wp_etl_migration_spark.sources.files import from_orc
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 4).alias("bucket"),
        F.concat(F.lit("row-"), F.col("id").cast("string"))
        .alias("name"))
    path = str(tmp_path / "plain")
    write_orc(df, path)
    back = from_orc(spark, path)
    assert back.count() == 100
    assert {tuple(r) for r in back.collect()} == \
        {tuple(r) for r in df.collect()}

    scan = from_orc(spark, path).where(F.col("id") > 90).select("id")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters:" in plan and "GreaterThan(id,90" in plan
    assert "name" not in plan        # column pruning reached the scan
    assert scan.count() == 9

    part = str(tmp_path / "parts")
    write_orc(df, part, partition_by=["bucket"])
    pruned = from_orc(spark, part).where(F.col("bucket") == 2)
    pplan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in pplan and "bucket" in \
        pplan.split("PartitionFilters")[1][:200]
    assert pruned.count() == 25

    # explicit schema read (the quarantine-style typed contract)
    typed = from_orc(spark, path, schema="id long, bucket long, "
                                         "name string")
    assert typed.schema.simpleString() == \
        "struct<id:bigint,bucket:bigint,name:string>"


def test_from_text_lines_and_whole_file(spark, tmp_path):
    """Raw text scan: line mode (one row per line, splittable) and
    whole-file mode (one row per file + its path), plus a custom
    line separator."""
    from wp_etl_migration_spark.sources.files import from_text
    d = tmp_path / "txt"
    d.mkdir()
    (d / "a.txt").write_text("doc one line one\ndoc one line two\n")
    (d / "b.txt").write_text("doc two only line\n")
    lines = from_text(spark, str(d))
    assert lines.columns == ["value"]
    assert lines.count() == 3

    whole = from_text(spark, str(d), whole_file=True)
    rows = {r.path.rsplit("/", 1)[-1]: r.value
            for r in whole.collect()}
    assert set(rows) == {"a.txt", "b.txt"}
    assert rows["b.txt"].strip() == "doc two only line"
    assert "line two" in rows["a.txt"]

    (d / "c.txt").write_text("one|two|three")
    seps = from_text(spark, str(d / "c.txt"), line_sep="|")
    assert [r.value for r in seps.collect()] == ["one", "two", "three"]
