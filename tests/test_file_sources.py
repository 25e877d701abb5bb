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
