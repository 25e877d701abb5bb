#!/usr/bin/env bash
# Cron entry point (SURVEY.md §3 EP3 — reference orchestration/cron/
# batch_job.sh): lock-file mutual exclusion, pre-flight checks,
# timeout + retries around the pipeline, cleanup, report.
set -euo pipefail

BASE_DIR="${PIPELINE_BASE_DIR:-/tmp/warehouse}"
REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
LOCK_FILE="${TMPDIR:-/tmp}/doeecommerce_pipeline.lock"
PIPELINE_TIMEOUT="${PIPELINE_TIMEOUT:-7200}"   # 2h, reference :33
MAX_RETRIES="${MAX_RETRIES:-2}"                # reference :34
RETRY_DELAY="${RETRY_DELAY:-300}"              # 5 min, reference :35
MIN_DISK_MB="${MIN_DISK_MB:-1024}"

log() { echo "[$(date -u '+%Y-%m-%dT%H:%M:%SZ')] $*"; }

# --- lock-file mutual exclusion (reference :54-73) ---
if [ -e "$LOCK_FILE" ]; then
    pid=$(cat "$LOCK_FILE" 2>/dev/null || true)
    if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
        log "another run holds the lock (pid $pid); exiting"
        exit 0
    fi
    log "stale lock (pid ${pid:-?}); removing"
    rm -f "$LOCK_FILE"
fi
echo $$ > "$LOCK_FILE"
trap 'rm -f "$LOCK_FILE"' EXIT

# --- pre-flight (reference :85-124, :225-237) ---
command -v python3 >/dev/null || { log "python3 missing"; exit 1; }
python3 -c "import pyspark" || { log "pyspark missing"; exit 1; }
avail_mb=$(df -Pm "${TMPDIR:-/tmp}" | awk 'NR==2 {print $4}')
[ "$avail_mb" -ge "$MIN_DISK_MB" ] || { log "only ${avail_mb}MB free"; exit 1; }

# --- pipeline with timeout + retries (reference :127-185) ---
attempt=0
until PYTHONPATH="$REPO_DIR" timeout "$PIPELINE_TIMEOUT" \
        python3 -m doeecommerce_datapipeline_spark.pipelines.runner \
        --base-dir "$BASE_DIR" --layer all; do
    attempt=$((attempt + 1))
    if [ "$attempt" -gt "$MAX_RETRIES" ]; then
        log "pipeline failed after $MAX_RETRIES retries"
        exit 1
    fi
    log "attempt $attempt failed; retrying in ${RETRY_DELAY}s"
    sleep "$RETRY_DELAY"
done

# --- cleanup + report (reference :187-223) ---
PYTHONPATH="$REPO_DIR" python3 - <<PY
from doeecommerce_datapipeline_spark.maintenance import clean_staging
from doeecommerce_datapipeline_spark.session import get_spark
from doeecommerce_datapipeline_spark.audit.ledger import AuditLedger
clean_staging("$BASE_DIR")
spark = get_spark("batch-report")
AuditLedger(spark, "$BASE_DIR/audit/ingestion_log").current_state().show(truncate=False)
PY
log "pipeline run complete"
