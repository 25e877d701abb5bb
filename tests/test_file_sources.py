"""CSV/JSONL quarantine sources: malformed rows never kill the job,
never silently vanish, and good rows parse to the declared schema."""

from pyspark.sql import types as T

from doeecommerce_datapipeline_spark.sources.files import (
    read_csv_quarantine,
    read_jsonl_quarantine,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


def test_csv_quarantine_split(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "id,name,amount\n"
        "1,alpha,10.5\n"
        "not_a_number,beta,2.0\n"  # id fails long coercion
        "3,gamma,oops\n"  # amount fails double coercion
        "4,delta,4.25\n"
    )
    good, bad = read_csv_quarantine(spark, str(p), SCHEMA)
    assert sorted(r["id"] for r in good.collect()) == [1, 4]
    assert good.columns == ["id", "name", "amount"]
    raws = sorted(r["raw_record"] for r in bad.collect())
    assert len(raws) == 2
    assert any("not_a_number" in r for r in raws)
    assert any("oops" in r for r in raws)


def test_jsonl_quarantine_split(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "alpha", "amount": 10.5}\n'
        "this is not json\n"
        '{"id": 3, "name": "gamma", "amount": 3.5}\n'
        '{"id": "also_bad", "name": "x", "amount": 1}\n'
    )
    good, bad = read_jsonl_quarantine(spark, str(p), SCHEMA)
    assert sorted(r["id"] for r in good.collect()) == [1, 3]
    raws = [r["raw_record"] for r in bad.collect()]
    assert len(raws) == 2
    assert any("not json" in r for r in raws)


def test_all_good_yields_empty_quarantine(spark, tmp_path):
    p = tmp_path / "clean.csv"
    p.write_text("id,name,amount\n1,a,1.0\n2,b,2.0\n")
    good, bad = read_csv_quarantine(spark, str(p), SCHEMA)
    assert good.count() == 2
    assert bad.count() == 0


def test_stream_quarantine_ingest(spark, tmp_path):
    """Streamed mixed-validity CSV files: clean rows land in the good
    ACID table, malformed lines in the quarantine table with their
    epoch, and nothing is lost or duplicated."""
    import os

    from doeecommerce_datapipeline_spark.sinks.manifest_store import ManifestTable
    from doeecommerce_datapipeline_spark.sources.files import (
        stream_quarantine_ingest,
    )

    src = tmp_path / "landing"
    os.makedirs(src)
    (src / "f0.csv").write_text("id,name,amount\n1,a,1.0\nbad_id,b,2.0\n")
    (src / "f1.csv").write_text("id,name,amount\n3,c,3.0\n4,d,bad_amount\n")

    good_path = str(tmp_path / "good_tbl")
    quar_path = str(tmp_path / "quar_tbl")
    stream, writer = stream_quarantine_ingest(
        spark, str(src), SCHEMA, good_path, quar_path
    )
    q = (
        stream.writeStream.foreachBatch(writer)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    good = ManifestTable(spark, good_path).read()
    assert sorted(r["id"] for r in good.collect()) == [1, 3]
    quar = ManifestTable(spark, quar_path).read().collect()
    raws = sorted(r["raw_record"] for r in quar)
    assert len(raws) == 2
    assert any("bad_id" in r for r in raws)
    assert any("bad_amount" in r for r in raws)
    # two source files → quarantine rows span ≥1 epochs, all recorded
    assert all(r["epoch"] is not None for r in quar)


def test_quarantine_replay_recovers_fixed_rows(spark, tmp_path):
    """Rows quarantined under a narrow schema replay cleanly under the
    corrected one; genuinely broken lines stay quarantined."""
    from doeecommerce_datapipeline_spark.sources.files import (
        replay_quarantine_csv,
    )

    p = tmp_path / "in.csv"
    p.write_text(
        "id,name,amount\n"
        "1,a,1.0\n"
        "2,b,not_a_number\n"  # breaks under DoubleType amount
        "x,c,3.0\n"  # broken id — unfixable by widening amount
    )
    good, bad = read_csv_quarantine(spark, str(p), SCHEMA)
    assert good.count() == 1 and bad.count() == 2

    # corrected schema: amount is a free-form string after all
    fixed = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("amount", T.StringType()),
        ]
    )
    recovered, still_bad = replay_quarantine_csv(spark, bad, fixed)
    rec = {r["id"]: r["amount"] for r in recovered.collect()}
    assert rec == {2: "not_a_number"}
    assert [r["raw_record"] for r in still_bad.collect()] == ["x,c,3.0"]


def test_read_write_any_roundtrip_all_native_formats(spark, tmp_path):
    from doeecommerce_datapipeline_spark.sources.files import (
        read_any,
        write_any,
    )

    df = spark.range(100).selectExpr(
        "id", "CAST(id * 2.5 AS DOUBLE) AS v", "CAST(id AS STRING) AS s"
    )
    want = sorted((r.id, r.v, r.s) for r in df.collect())
    for fmt, opts in [
        ("parquet", {}),
        ("orc", {}),
        ("csv", {"header": "true", "inferSchema": "true"}),
        ("json", {}),
    ]:
        p = str(tmp_path / f"rt_{fmt}")
        write_any(df, p, fmt, header="true") if fmt == "csv" else write_any(
            df, p, fmt
        )
        back = read_any(spark, p, fmt, **opts).selectExpr(
            # csv's inferSchema can't know digits-only s was a string —
            # normalize types before comparing values
            "CAST(id AS BIGINT) AS id",
            "CAST(v AS DOUBLE) AS v",
            "CAST(s AS STRING) AS s",
        )
        got = sorted((r.id, r.v, r.s) for r in back.collect())
        assert got == want, fmt


def test_read_any_rejects_unknown_and_gates_avro(spark, tmp_path):
    import pytest as _pytest

    from doeecommerce_datapipeline_spark.sources.files import read_any

    with _pytest.raises(ValueError):
        read_any(spark, str(tmp_path), "xml")
    # in this env spark-avro is absent, so the gate raises ImportError
    with _pytest.raises(ImportError):
        read_any(spark, str(tmp_path), "avro")


def test_avro_gate_only_translates_missing_source():
    """An ordinary failure on the avro path (missing file, schema
    error, permissions) must NOT be reported as a missing dependency."""
    from pyspark.errors import AnalysisException

    from doeecommerce_datapipeline_spark.sources.files import (
        _is_missing_avro_source,
    )

    assert _is_missing_avro_source(
        AnalysisException("Failed to find data source: avro. Avro is "
                          "built-in but external data source module")
    )
    assert not _is_missing_avro_source(
        AnalysisException("[PATH_NOT_FOUND] Path does not exist: "
                          "file:/tmp/nope.avro")
    )
    assert not _is_missing_avro_source(PermissionError("denied"))


def test_text_roundtrip_via_read_write_any(spark, tmp_path):
    """Raw-text landing format: write a single string column as lines,
    read it back as the `value` column — the LLM-corpus drop shape."""
    from doeecommerce_datapipeline_spark.sources.files import (
        read_any,
        write_any,
    )

    df = spark.createDataFrame(
        [("first line",), ("second line",), ("third",)], "value string"
    )
    p = str(tmp_path / "drop_txt")
    write_any(df, p, "text")
    back = read_any(spark, p, "text")
    assert back.columns == ["value"]
    assert sorted(r.value for r in back.collect()) == [
        "first line", "second line", "third",
    ]
