"""Table IO over the driver-generated parquet testdata.

Reference analog: the reference reads full tables via
``pd.read_sql_table`` (scripts/run_pipeline.py:227-240, operator S5 in
SURVEY.md §2.1) — here a columnar parquet scan with Catalyst pushdown.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .session import ensure_oracle_compat

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Column pruning + predicate pushdown are
    Catalyst's job — callers express plain select/filter.

    events.ts has shipped as both TIMESTAMP(NANOS) — which Spark 4
    rejects by default — and plain TIMESTAMP(MICROS), depending on the
    generator version. Handle both: sniff the footer with pyarrow (a
    KB-sized metadata read), and only for genuinely-nanos files enable
    the nanos-as-long fallback, scoped set/restore around the read so
    the shared session's conf is untouched for every other parquet
    read (restore-after-read is safe: Spark converts the parquet
    schema eagerly at read resolution, verified by a collect after
    restore on a nanos file). The int64-nanos column then converts via
    integer division — a double quotient would lose precision on
    ~1.7e18 nanosecond epoch values, 53-bit mantissa.
    """
    ensure_oracle_compat(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        if _events_ts_is_nanos(path):
            conf_key = "spark.sql.legacy.parquet.nanosAsLong"
            prev = spark.conf.get(conf_key, None)
            spark.conf.set(conf_key, "true")
            try:
                df = spark.read.parquet(path)
            finally:
                if prev is None:
                    spark.conf.unset(conf_key)
                else:
                    spark.conf.set(conf_key, prev)
            if isinstance(df.schema["ts"].dataType, LongType):
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            return df
        df = spark.read.parquet(path)
        # parquet timestamp without isAdjustedToUTC surfaces as
        # TIMESTAMP_NTZ; the session tz is pinned UTC, so this cast
        # is value-preserving and keeps one ts type everywhere
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(path)


def _events_ts_is_nanos(path: str) -> bool:
    """Footer-only probe for a TIMESTAMP(NANOS) ts column. Parquet
    datasets may be a directory of part files — probe the first one."""
    try:
        import pyarrow.parquet as pq

        probe = path
        if os.path.isdir(path):
            parts = sorted(
                f
                for f in os.listdir(path)
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            )
            if not parts:
                return False
            probe = os.path.join(path, parts[0])
        schema = pq.read_schema(probe)
        if "ts" not in schema.names:
            return False
        return str(schema.field("ts").type) == "timestamp[ns]"
    except Exception:
        # no pyarrow / unreadable footer: fall through to the plain
        # read path and let Spark surface the real error
        return False


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound=None,
    upper_bound=None,
    driver: str | None = None,
    **options: str,
) -> DataFrame:
    """S5 JDBC scan — the reference's actual storage path
    (``pd.read_sql_table`` over Postgres, scripts/run_pipeline.py:
    227-240), which pulls the whole table through ONE driver-side
    connection. The Spark analog splits the scan into
    ``num_partitions`` range queries on ``partition_column`` (one
    connection per executor task) — at 100 TB the partitioned form is
    the only viable one, and the column should be an indexed,
    roughly-uniform key. Catalyst pushes filters into the remote query
    (shows as PushedFilters on the JDBCRelation scan)."""
    r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        r = r.option("driver", driver)
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions or 8))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str | None = None,
    **options: str,
) -> None:
    """JDBC sink (the reference's ``to_sql``; each partition writes
    over its own connection — batched inserts via the standard
    ``batchsize`` option)."""
    w = df.write.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        w = w.option("driver", driver)
    for k, v in options.items():
        w = w.option(k, v)
    w.mode(mode).save()


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for the SQL API)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
