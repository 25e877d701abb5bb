"""LIVE HTTP tests for the REST sources against a localhost stdlib
server — the real `requests` path (retry/backoff, offset pagination,
executor-side distributed fetch), no external network needed.

The server mimics the reference's paginated API shape
(ingestion_util.py:257-318: skip/limit params, items under a response
key, short final page terminates) plus a flaky endpoint for the
retry/backoff contract (C1)."""

import http.server
import json
import threading
from urllib.parse import parse_qs, urlparse

import pytest
from pyspark.sql import types as T

from doeecommerce_datapipeline_spark.sources.rest import (
    HAVE_REQUESTS,
    RecordsSource,
    RestSource,
    distributed_fetch,
    with_lineage,
)

pytestmark = pytest.mark.skipif(not HAVE_REQUESTS, reason="requests missing")

ITEMS = [{"id": i, "title": f"item{i}", "price": float(i)} for i in range(25)]


class _Handler(http.server.BaseHTTPRequestHandler):
    fail_counter = {"n": 0}
    seen_paths: list = []

    def _send(self, obj, status=200):
        body = json.dumps(obj).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 (stdlib API)
        u = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(u.query).items()}
        _Handler.seen_paths.append(self.path)
        if u.path == "/products":
            skip, limit = int(q.get("skip", 0)), int(q.get("limit", 100))
            self._send(
                {
                    "products": ITEMS[skip : skip + limit],
                    "total": len(ITEMS),
                    "skip": skip,
                }
            )
        elif u.path == "/flaky":
            _Handler.fail_counter["n"] += 1
            if _Handler.fail_counter["n"] <= 2:
                self._send({"error": "try later"}, status=503)
            else:
                self._send({"ok": True, "attempts": _Handler.fail_counter["n"]})
        elif u.path.startswith("/page/"):
            i = int(u.path.rsplit("/", 1)[1])
            self._send([{"page": i, "val": i * 10}, {"page": i, "val": i * 10 + 1}])
        else:
            self._send({"error": "not found"}, status=404)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture(scope="module")
def server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_with_params(server):
    src = RestSource(server)
    out = src.fetch("/products", {"skip": 5, "limit": 3})
    assert [r["id"] for r in out["products"]] == [5, 6, 7]


def test_retry_backoff_recovers_from_5xx(server):
    _Handler.fail_counter["n"] = 0
    src = RestSource(server, max_retries=3, backoff=1.0, initial_delay=0.05)
    out = src.fetch("/flaky")
    assert out == {"ok": True, "attempts": 3}  # two 503s absorbed


def test_retry_exhaustion_raises(server):
    _Handler.fail_counter["n"] = -100  # 102 failures queued
    src = RestSource(server, max_retries=1, initial_delay=0.05)
    import requests

    with pytest.raises(requests.HTTPError):
        src.fetch("/flaky")


def test_fetch_paginated_until_short_page(server):
    _Handler.seen_paths.clear()
    src = RestSource(server)
    items = src.fetch_paginated(
        "/products", page_size=10, response_key="products"
    )
    assert [r["id"] for r in items] == list(range(25))
    pages = [p for p in _Handler.seen_paths if p.startswith("/products")]
    assert len(pages) == 3  # 10 + 10 + short 5 stops the loop


def test_distributed_fetch_executor_side(spark, server):
    schema = T.StructType(
        [
            T.StructField("page", T.LongType()),
            T.StructField("val", T.LongType()),
        ]
    )
    df = distributed_fetch(
        spark, lambda i: f"{server}/page/{i}", n_pages=8, schema=schema
    )
    rows = df.collect()
    assert len(rows) == 16  # 2 records per page
    assert {r["page"] for r in rows} == set(range(8))


def test_live_fetch_to_bronze_frame(spark, server):
    """The full ingest shape: HTTP page → RecordsSource → lineage."""
    src = RestSource(server)
    items = src.fetch_paginated("/products", page_size=10, response_key="products")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("title", T.StringType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    df = with_lineage(
        RecordsSource(spark, schema).to_df(items), "fakestore", "/products"
    )
    assert df.count() == 25
    assert df.where("_source_name = 'fakestore'").count() == 25
    assert df.schema["_ingestion_timestamp"].dataType.typeName() == "timestamp"


def test_live_http_medallion_end_to_end(spark, tmp_path):
    """EP1 over a LIVE paginated HTTP API: the reference's primary
    entry point (ingest → bronze → silver → quality → gold) with every
    record fetched from a localhost server instead of the fixture
    seam. Timestamps/decimals round-trip JSON as ISO strings / floats
    and are re-typed at the seam — exactly what a real API delivers."""
    import datetime
    import decimal  # noqa: F401 (jsonable)
    import http.server as hs
    import threading as th

    from doeecommerce_datapipeline_spark import fixtures
    from doeecommerce_datapipeline_spark.pipelines.runner import run_pipeline

    data = {
        "products": fixtures.products_raw(80),
        "carts": fixtures.carts_raw(80, n_users=40),
        "users": fixtures.users_raw(80),
        "orders": fixtures.orders_raw(80, n_users=40),
    }

    def jsonable(v):
        if isinstance(v, dict):
            return {k: jsonable(x) for k, x in v.items()}
        if isinstance(v, list):
            return [jsonable(x) for x in v]
        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.isoformat()
        if isinstance(v, decimal.Decimal):
            return float(v)
        return v

    class ApiHandler(hs.BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            u = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            t = u.path.strip("/")
            rows = data.get(t)
            if rows is None:
                body = json.dumps({"error": "nope"}).encode()
                self.send_response(404)
            else:
                skip, limit = int(q.get("skip", 0)), int(q.get("limit", 100))
                page = [
                    {k: jsonable(v) for k, v in r.items()}
                    for r in rows[skip : skip + limit]
                ]
                body = json.dumps({t: page, "total": len(rows)}).encode()
                self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = hs.ThreadingHTTPServer(("127.0.0.1", 0), ApiHandler)
    th.Thread(target=srv.serve_forever, daemon=True).start()
    base_url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        src = RestSource(base_url)

        from doeecommerce_datapipeline_spark.pipelines.runner import RAW_SCHEMAS
        from doeecommerce_datapipeline_spark.sources.rest import (
            coerce_json_records,
        )

        def fetch_table(t):
            def _get():
                recs = src.fetch_paginated(
                    f"/{t}", page_size=32, response_key=t
                )
                # schema-driven re-typing (nested decimals/timestamps)
                return coerce_json_records(recs, RAW_SCHEMAS[t])

            return _get

        base = str(tmp_path / "wh")
        run_pipeline(
            spark,
            base,
            layer="all",
            records_fn={t: fetch_table(t) for t in data},
            source_name="live_http",
        )

        # silver landed deduped; gold marts exist; ledger says SUCCESS
        products = spark.read.parquet(f"{base}/silver/products")
        assert products.count() == products.select("product_id").distinct().count() > 0
        for mart in ("finance_mart", "sales_mart", "operations_mart"):
            assert spark.read.parquet(f"{base}/gold/{mart}").count() > 0
        log = spark.read.parquet(f"{base}/audit/ingestion_log")
        assert (
            log.where("source_name = 'live_http' AND status = 'SUCCESS'")
            .count() >= 2
        )
        # fixture records carry their ORIGINAL source stamps (replay
        # semantics: with_lineage only fills missing values), so the
        # bronze rows keep the upstream names — lineage is per-row,
        # the ledger carries the ingest identity
        bronze = spark.read.parquet(f"{base}/bronze/products_raw")
        assert bronze.where("_source_name IS NULL").count() == 0
    finally:
        srv.shutdown()
