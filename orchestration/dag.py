"""Airflow DAG parity (SURVEY.md §3 EP2 — reference
orchestration/airflow/dags/doeecommerce_batch_pipeline.py:258-359).

Same task graph: start → [ingest × sources in parallel] →
check_ingestion branch → transformation | ingestion_failed →
quality_checks → gold_publishing → cleanup (ALL_DONE) →
metrics_report → end.

Import-gated: Airflow isn't in this container. Every task body calls
the same engine stages the CLI runner uses, so the DAG is a thin
scheduling skin — metrics travel through the audit ledger, not XCom
(the ledger outlives the scheduler and is queryable by the engine).
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

try:
    from airflow import DAG
    from airflow.operators.empty import EmptyOperator
    from airflow.operators.python import BranchPythonOperator, PythonOperator
    from airflow.utils.trigger_rule import TriggerRule

    HAVE_AIRFLOW = True
except Exception:  # pragma: no cover
    HAVE_AIRFLOW = False

BASE_DIR = os.environ.get("PIPELINE_BASE_DIR", "/tmp/warehouse")
SOURCES = ["products", "carts", "users", "orders"]


def _spark():
    from doeecommerce_datapipeline_spark.session import get_spark

    return get_spark("airflow-pipeline")


def task_ingest(source: str) -> None:
    from doeecommerce_datapipeline_spark.audit.ledger import AuditLedger
    from doeecommerce_datapipeline_spark.pipelines.runner import run_ingestion

    spark = _spark()
    ledger = AuditLedger(spark, f"{BASE_DIR}/audit/ingestion_log")
    run_ingestion(spark, BASE_DIR, ledger, [source])


def check_ingestion() -> str:
    """BranchPythonOperator body (reference :151-191): branch on the
    ledger's latest run states instead of XCom dicts."""
    from pyspark.sql import functions as F

    from doeecommerce_datapipeline_spark.audit.ledger import AuditLedger

    ledger = AuditLedger(_spark(), f"{BASE_DIR}/audit/ingestion_log")
    bad = ledger.current_state().where(F.col("status") == "FAILED").count()
    return "ingestion_failed" if bad else "transformation"


def task_transform() -> None:
    from doeecommerce_datapipeline_spark.pipelines.runner import run_transformation

    run_transformation(_spark(), BASE_DIR, SOURCES)


def task_quality() -> None:
    from doeecommerce_datapipeline_spark.pipelines.runner import run_quality

    if not run_quality(_spark(), BASE_DIR):
        raise RuntimeError("quality checks failed")  # halts the DAG (:163-179)


def task_gold() -> None:
    from datetime import date

    from doeecommerce_datapipeline_spark.pipelines.runner import run_gold

    run_gold(_spark(), BASE_DIR, date.today())


def task_cleanup() -> None:
    from doeecommerce_datapipeline_spark.maintenance import clean_staging
    from doeecommerce_datapipeline_spark.sinks.parquet_sinks import retention_delete

    spark = _spark()
    clean_staging(BASE_DIR)
    for s in SOURCES:
        p = f"{BASE_DIR}/bronze/{s}_raw"
        if os.path.exists(p):
            retention_delete(spark, p, "_ingestion_timestamp", keep_days=7)


def task_metrics_report() -> None:
    from doeecommerce_datapipeline_spark.audit.ledger import AuditLedger

    AuditLedger(_spark(), f"{BASE_DIR}/audit/ingestion_log").current_state().show()


if HAVE_AIRFLOW:  # pragma: no cover
    with DAG(
        dag_id="ecommerce_batch_pipeline",
        schedule="0 0 * * *",
        start_date=datetime(2024, 1, 1),
        catchup=False,
        default_args={
            "retries": 2,
            "retry_delay": timedelta(minutes=5),
            "execution_timeout": timedelta(hours=2),
        },
    ) as dag:
        start = EmptyOperator(task_id="start")
        ingest = [
            PythonOperator(
                task_id=f"ingest_{s}", python_callable=task_ingest, op_args=[s]
            )
            for s in SOURCES
        ]
        branch = BranchPythonOperator(
            task_id="check_ingestion", python_callable=check_ingestion
        )
        transformation = PythonOperator(
            task_id="transformation", python_callable=task_transform
        )
        ingestion_failed = EmptyOperator(task_id="ingestion_failed")
        quality = PythonOperator(task_id="quality_checks", python_callable=task_quality)
        gold = PythonOperator(task_id="gold_publishing", python_callable=task_gold)
        cleanup = PythonOperator(
            task_id="cleanup",
            python_callable=task_cleanup,
            trigger_rule=TriggerRule.ALL_DONE,
        )
        report = PythonOperator(
            task_id="metrics_report", python_callable=task_metrics_report
        )
        end = EmptyOperator(task_id="end")

        start >> ingest >> branch >> [transformation, ingestion_failed]
        transformation >> quality >> gold >> cleanup >> report >> end
        ingestion_failed >> cleanup
