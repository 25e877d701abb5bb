"""The package zip shipped to Python workers must contain every module
a serialized closure can reference."""

import zipfile

from doeecommerce_datapipeline_spark import pyfiles


def test_zip_contains_package():
    path = pyfiles._build_zip()
    names = zipfile.ZipFile(path).namelist()
    for mod in [
        "doeecommerce_datapipeline_spark/__init__.py",
        "doeecommerce_datapipeline_spark/multimodal/decode.py",
        "doeecommerce_datapipeline_spark/sources/rest.py",
        "doeecommerce_datapipeline_spark/streaming/stateful.py",
        "doeecommerce_datapipeline_spark/pyfiles.py",
    ]:
        assert mod in names
    assert not any("__pycache__" in n for n in names)


def test_ensure_shipped_idempotent(spark):
    pyfiles.ensure_shipped(spark)
    pyfiles.ensure_shipped(spark)  # second call is a no-op, not an error
    assert spark.sparkContext.applicationId in pyfiles._SHIPPED_APPS
