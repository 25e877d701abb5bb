"""File-format sources beyond parquet: CSV and JSON-lines with
schema-on-read and corrupt-record QUARANTINE.

Reference analog: the reference ingests REST JSON and DB tables only
(ingestion/ingestion_util.py, scripts/run_pipeline.py:227-240); raw
CSV/JSONL drops are the other ubiquitous landing-zone format, and the
production requirement is that a malformed row never kills the job
AND never silently disappears — it lands in a quarantine output with
the raw line preserved (the same contract as quality/validators.py's
predicate quarantine, applied at parse time).

Implementation: Spark's PERMISSIVE parse mode with an explicit
``columnNameOfCorruptRecord`` — malformed rows surface as NULLs plus
the raw text in the corrupt column, split into (good, quarantined)
DataFrames. Schema is REQUIRED: schema inference is a full extra pass
over 100 TB and nondeterministic under sampling; landing-zone
contracts are declared, not guessed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_field(schema: T.StructType) -> T.StructType:
    """PERMISSIVE mode needs the corrupt column present in the schema."""
    if CORRUPT_COL in schema.names:
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    **options,
) -> tuple[DataFrame, DataFrame]:
    """CSV scan → (good, quarantined).

    good: rows that parsed clean, corrupt column dropped.
    quarantined: the raw malformed line (one string column) for
    replay/debug — rows where ANY field failed to parse.

    The split is two filters over ONE cached parse plan; Spark pushes
    the schema into the scan so good rows never materialize the raw
    line. Multiline quoting, custom delimiters etc. pass through via
    **options.
    """
    full = _with_corrupt_field(schema)
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .options(**options)
        .csv(path)
    )
    # caching the parsed frame keeps the two filters one parse pass;
    # at scale this is a persist on the (columnar) parsed batches
    df = df.cache()
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_record")
    )
    return good, bad


def read_jsonl_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    **options,
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines scan → (good, quarantined); same contract as
    ``read_csv_quarantine``. A line that is not valid JSON, or whose
    fields can't coerce to the declared schema, quarantines with the
    raw line intact."""
    full = _with_corrupt_field(schema)
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .options(**options)
        .json(path)
    )
    df = df.cache()
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_record")
    )
    return good, bad


def stream_quarantine_ingest(
    spark: SparkSession,
    src_path: str,
    schema: T.StructType,
    good_path: str,
    quarantine_path: str,
    fmt: str = "csv",
    header: bool = True,
    **options,
):
    """Streaming landing-zone ingest: watch ``src_path`` for new
    CSV/JSONL files, split each micro-batch on parse validity, and
    publish BOTH halves to ACID manifest tables — clean rows append to
    ``good_path``, malformed raw lines (with the source epoch for
    replay) to ``quarantine_path``. Returns the foreachBatch writer;
    callers own the writeStream lifecycle.

    The commit protocol makes the two appends per batch individually
    atomic and concurrent-writer-safe; quarantine rows carry the epoch
    so a fixed parser can replay exactly the affected batches.
    """
    from ..sinks.manifest_store import ManifestTable

    full = _with_corrupt_field(schema)
    reader = (
        spark.readStream.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("maxFilesPerTrigger", 1)
        .options(**options)
    )
    if fmt == "csv":
        stream = reader.option("header", str(header).lower()).csv(src_path)
    elif fmt == "json":
        stream = reader.json(src_path)
    else:
        raise ValueError(f"unsupported stream format: {fmt}")

    def _write(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sess = batch_df.sparkSession
        good = batch_df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
        bad = batch_df.where(F.col(CORRUPT_COL).isNotNull()).select(
            F.col(CORRUPT_COL).alias("raw_record"),
            F.lit(epoch_id).alias("epoch"),
        )
        if not good.isEmpty():
            ManifestTable(sess, good_path).append(good)
        if not bad.isEmpty():
            ManifestTable(sess, quarantine_path).append(bad)

    return stream, _write


def replay_quarantine_csv(
    spark: SparkSession,
    quarantine_df: DataFrame,
    schema: T.StructType,
    **options,
) -> tuple[DataFrame, DataFrame]:
    """Close the quarantine loop: re-parse quarantined raw CSV lines
    under a (corrected) schema — rows that now parse return as typed
    records, the rest stay quarantined. The operational flow is
    quarantine → fix schema/upstream → replay → upsert the recovered
    rows; nothing is ever lost to a parse bug.

    Built on ``from_csv`` over the stored raw lines (no re-read of the
    landing zone), so a replay is a scan of the quarantine table only.
    """
    full = _with_corrupt_field(schema)
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}
    opts.update({k: str(v) for k, v in options.items()})
    parsed = quarantine_df.select(
        F.col("raw_record"),
        F.from_csv(F.col("raw_record"), full.simpleString(), opts).alias("r"),
    )
    good = parsed.where(F.col(f"r.{CORRUPT_COL}").isNull()).select(
        *[F.col(f"r.{f.name}").alias(f.name) for f in schema.fields]
    )
    still_bad = parsed.where(F.col(f"r.{CORRUPT_COL}").isNotNull()).select(
        "raw_record"
    )
    return good, still_bad


def _is_missing_avro_source(e: Exception) -> bool:
    """True only for the missing-data-source failure — an ordinary
    error on the avro path (missing file, schema mismatch, permission
    denied) must propagate unchanged, not masquerade as a missing
    dependency."""
    msg = str(e)
    return (
        "Failed to find data source: avro" in msg
        or "FAILED_TO_LOAD_DATA_SOURCE" in msg
        or "AvroFileFormat" in msg
        and "ClassNotFoundException" in msg
    )


def read_any(spark: SparkSession, path: str, fmt: str, **options) -> DataFrame:
    """Uniform multi-format reader: parquet / orc / csv / json are
    native; avro is import-gated (the external spark-avro module isn't
    bundled in every distribution — same seam as the REST source's
    HTTP gate). One entry point so pipelines parameterize landing-zone
    format instead of branching at every call site."""
    fmt = fmt.lower()
    if fmt in {"parquet", "orc", "csv", "json", "text"}:
        # text: one `value` string column per line (raw-corpus drops —
        # the landing format LLM ingestion sees most); pass
        # lineSep/wholetext through options
        reader = spark.read.options(**options)
        return getattr(reader, fmt)(path)
    if fmt == "avro":
        try:
            return spark.read.options(**options).format("avro").load(path)
        except Exception as e:  # pragma: no cover - env-dependent
            if _is_missing_avro_source(e):
                raise ImportError(
                    "avro requires the external spark-avro package"
                ) from e
            raise  # real failure (missing path, schema, permissions)
    raise ValueError(f"unsupported format: {fmt}")


def write_any(df: DataFrame, path: str, fmt: str, mode: str = "overwrite",
              **options) -> None:
    """Writer twin of read_any (same format gate)."""
    fmt = fmt.lower()
    if fmt in {"parquet", "orc", "csv", "json", "text"}:
        # text requires a single string column (Spark's contract)
        getattr(df.write.mode(mode).options(**options), fmt)(path)
        return
    if fmt == "avro":
        try:
            df.write.mode(mode).options(**options).format("avro").save(path)
            return
        except Exception as e:  # pragma: no cover - env-dependent
            if _is_missing_avro_source(e):
                raise ImportError(
                    "avro requires the external spark-avro package"
                ) from e
            raise  # real failure (missing path, schema, permissions)
    raise ValueError(f"unsupported format: {fmt}")
