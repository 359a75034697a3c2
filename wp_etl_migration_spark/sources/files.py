"""File-format scans (SURVEY §2.1 S1–S3).

Thin, explicit wrappers over ``spark.read`` so YAML job configs map 1:1
onto reader options while Catalyst keeps predicate pushdown / column
pruning / partition planning (the reference's Finder + adapter factory,
Extract AdapterFactory.php:63-169, collapses to this).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def from_csv(spark: SparkSession, path: str, header: bool = True,
             infer_schema: bool = True, schema: str | None = None,
             **options) -> DataFrame:
    """CSV scan ≙ ``from_csv(path)`` (adapter: csv)."""
    reader = (spark.read
              .option("header", str(header).lower())
              .option("inferSchema", str(infer_schema).lower()))
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def from_json(spark: SparkSession, path: str, multi_line: bool = False,
              schema: str | None = None, **options) -> DataFrame:
    """JSON scan ≙ ``from_json(path)`` (adapter: json). JSONL by default;
    ``multi_line=True`` for a top-level array document."""
    reader = spark.read.option("multiLine", str(multi_line).lower())
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def from_xml(spark: SparkSession, path: str, row_tag: str | None = None,
             node_path: str | None = None, **options) -> DataFrame:
    """XML scan ≙ ``from_xml(path)->withXMLNodePath('rss/channel/item')``
    (AdapterFactory.php:152-169).

    Spark 4 ships the XML source natively. With ``row_tag`` alone the
    repeating node matches at ANY depth (Spark's rowTag semantics) —
    fine for well-formed feeds, wrong when a decoy tag with the same
    name exists at another depth. ``node_path`` anchors the full path
    like the reference: the document is read with the path's ROOT as
    the row tag, then each remaining segment is navigated explicitly
    (struct field access, arrays exploded), so only nodes at exactly
    that path are selected. Anchoring costs nothing at scale — it is
    pure Column navigation on the parsed tree, no extra scan.
    """
    if node_path:
        segs = [s for s in node_path.strip("/").split("/") if s]
        if len(segs) > 1:
            from pyspark.sql.types import ArrayType

            doc = from_xml(spark, path, row_tag=segs[0], **options)
            cur = doc.select(F.col(segs[1]).alias("__n"))
            for seg in segs[2:]:
                if isinstance(cur.schema["__n"].dataType, ArrayType):
                    cur = cur.select(F.explode("__n").alias("__n"))
                cur = cur.select(F.col("__n").getField(seg).alias("__n"))
            if isinstance(cur.schema["__n"].dataType, ArrayType):
                cur = cur.select(F.explode("__n").alias("__n"))
            return cur.where(F.col("__n").isNotNull()).select("__n.*")
        row_tag = segs[0]
    if row_tag is None:
        raise ValueError("from_xml requires row_tag or node_path")
    reader = spark.read.option("rowTag", row_tag)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.xml(path)


def from_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan — the engine's canonical columnar input."""
    return spark.read.parquet(path)


CORRUPT_COL = "__corrupt_record"


def from_json_with_quarantine(spark: SparkSession, path: str,
                              schema: str,
                              multi_line: bool = False,
                              **options) -> tuple[DataFrame, DataFrame]:
    """JSON scan with parse-level error isolation: returns
    ``(clean, corrupt)``.

    PERMISSIVE mode parks unparseable lines in a corrupt-record column
    instead of failing the job (the scan-time complement of
    ``operators.quarantine``'s rule-level split — ≙ the reference's
    per-row try/catch, SynchronousPipelineLoader.php:42-48, applied at
    parse time). A schema is required: inference would silently widen
    types around bad rows instead of flagging them. ``corrupt`` holds
    one row per bad line with the raw text for replay.

    The two frames deliberately share a plan, not a cache: consuming
    both re-parses the input (two scans). Pinning a corpus-scale scan
    in executor storage for the session lifetime is the worse trade —
    parsing is deterministic, so the split is consistent either way.
    ``corrupt`` keeps the parsed columns alongside ``raw`` (they also
    satisfy Spark's rule that a raw-scan query may not reference ONLY
    the corrupt-record column).
    """
    df = from_json(spark, path, multi_line=multi_line,
                   schema=f"{schema}, {CORRUPT_COL} STRING",
                   mode="PERMISSIVE",
                   columnNameOfCorruptRecord=CORRUPT_COL, **options)
    bad = F.col(CORRUPT_COL).isNotNull()
    clean = df.where(~bad).drop(CORRUPT_COL)
    corrupt = df.where(bad).withColumnRenamed(CORRUPT_COL, "raw")
    return clean, corrupt


def from_csv_with_quarantine(spark: SparkSession, path: str,
                             schema: str, header: bool = True,
                             **options) -> tuple[DataFrame, DataFrame]:
    """CSV scan with parse-level error isolation — see
    ``from_json_with_quarantine`` (including the two-scan note)."""
    df = from_csv(spark, path, header=header, infer_schema=False,
                  schema=f"{schema}, {CORRUPT_COL} STRING",
                  mode="PERMISSIVE",
                  columnNameOfCorruptRecord=CORRUPT_COL, **options)
    bad = F.col(CORRUPT_COL).isNotNull()
    clean = df.where(~bad).drop(CORRUPT_COL)
    corrupt = df.where(bad).withColumnRenamed(CORRUPT_COL, "raw")
    return clean, corrupt


def from_orc(spark: SparkSession, path: str,
             schema: str | None = None, **options) -> DataFrame:
    """ORC scan — no reference counterpart (file inputs there are
    CSV/JSON/XML); included because ORC is the other major columnar
    warehouse format corpora arrive in, and Spark's native reader
    gives it the same Catalyst treatment as parquet: predicate
    pushdown, column pruning, partition discovery (PushedFilters
    asserted in tests/test_sources.py)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.orc(path)


def from_text(spark: SparkSession, path: str,
              whole_file: bool = False,
              line_sep: str | None = None) -> DataFrame:
    """Raw text scan — no reference counterpart; included because raw
    ``.txt``/WET-style dumps are the other arrival format of web
    corpora (one document per line, or one per file). Returns a
    single ``value`` string column; with ``whole_file=True`` each
    file becomes ONE row plus its ``path`` (via
    ``input_file_name()``) — the shape a per-file document corpus
    loads as before an id-assignment pass.

    Scale: line mode is Spark's native text source (splittable,
    parallel by HDFS block); whole-file mode is NOT splittable (one
    task per file — fine for many medium files, wrong for one giant
    file) and says so here rather than surprising at 100 TB."""
    if whole_file:
        return (spark.read.option("wholetext", True).text(path)
                .select(F.input_file_name().alias("path"), "value"))
    reader = spark.read
    if line_sep is not None:
        reader = reader.option("lineSep", line_sep)
    return reader.text(path)


def from_binary_files(spark: SparkSession, path: str,
                      path_glob: str | None = None) -> DataFrame:
    """Binary-file scan (Spark's native ``binaryFile`` source) — the
    ingestion leg of the multimodal column family: image/audio/video
    files load as (path, modificationTime, length, content binary)
    rows, and ``content`` feeds straight into
    ``operators.multimodal.decode_media`` / ``resize_media`` /
    ``extract_features``. ``path_glob`` maps to ``pathGlobFilter``
    (e.g. ``"*.bmp"``) so non-media siblings never load.

    Scale: one task per file (binary payloads are not splittable —
    inherent to the format, same note as ``from_text(whole_file=
    True)``); filters on ``path``/``length``/``modificationTime``
    push down to the file listing, so a predicate like
    ``length < 10*1024*1024`` prunes oversized payloads before any
    bytes are read."""
    reader = spark.read.format("binaryFile")
    if path_glob is not None:
        reader = reader.option("pathGlobFilter", path_glob)
    return reader.load(path)
