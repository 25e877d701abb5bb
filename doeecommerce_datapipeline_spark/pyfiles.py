"""Ship this package to Python workers programmatically.

Operators that ship Python closures to executors (mapInPandas /
applyInPandasWithState) serialize functions that reference this
package by module name; the worker processes must be able to IMPORT
the package, and they inherit neither the driver's ``sys.path`` edits
nor its cwd on a real cluster. ``spark-submit --py-files`` is the
deployment-time answer; this module invokes the same mechanism
(``SparkContext.addPyFile``) at runtime so the driver contract is
self-carrying: a vanilla session created anywhere can run the
closure-shipping queries without environment setup.

Cost: one ~100 KB zip per driver process, shipped once per Spark app —
negligible against any real job, and identical to what --py-files
would distribute.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_ZIP_PATH: str | None = None
_SHIPPED_APPS: set[str] = set()


def _build_zip() -> str:
    """Zip the package sources (pid-suffixed path: fresh per process,
    no clashes between concurrent drivers; atomic replace)."""
    root = os.path.dirname(_PKG_DIR)
    fd, tmp = tempfile.mkstemp(suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirs, files in os.walk(_PKG_DIR):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    zf.write(full, os.path.relpath(full, root))
    final = os.path.join(
        tempfile.gettempdir(),
        f"doeecommerce_datapipeline_spark-pyfiles-{os.getpid()}.zip",
    )
    os.replace(tmp, final)
    return final


def ensure_shipped(spark: SparkSession) -> None:
    """Idempotently addPyFile this package for the given session's app.

    Call before returning any DataFrame whose plan ships a closure
    referencing this package. Safe to call repeatedly (once per Spark
    application does the work)."""
    global _ZIP_PATH
    sc = spark.sparkContext
    app_id = sc.applicationId
    if app_id in _SHIPPED_APPS:
        return
    if _ZIP_PATH is None or not os.path.exists(_ZIP_PATH):
        _ZIP_PATH = _build_zip()
    sc.addPyFile(_ZIP_PATH)
    _SHIPPED_APPS.add(app_id)
