"""Free-text PII detection/redaction: exact counts and byte-exact
redacted output on hand-built rows, plus registry-face shape and
class coverage over the synth CRM notes."""

from pyspark.sql import functions as F

from doeecommerce_datapipeline_spark.operators.pii import (
    pii_redact,
    pii_scan,
    pii_redaction_audit,
    pii_scan_report,
    synth_crm_notes,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "id long, text string")


def test_scan_counts_hand_rows(spark):
    rows = [
        (0, "no pii here at all"),
        (1, "mail a.b+c@ex-ample.co.uk and x_1%y@host.org today"),
        (2, "dial +1-212-555-0199 then +1-646-555-0142"),
        (3, "hosts 10.0.0.1 and 255.255.255.255 and 1.2.3.4"),
        (4, "mixed: a@b.io via 192.168.0.7 call +1-303-555-0000"),
        (5, "card 4111-1111-1111-1111 vs fake 4111-1111-1111-1112"),
    ]
    got = {
        r["id"]: (
            r["n_emails"],
            r["n_phones"],
            r["n_ipv4"],
            r["n_cards"],
            r["has_pii"],
        )
        for r in pii_scan(_frame(spark, rows), "id", "text").collect()
    }
    assert got[0] == (0, 0, 0, 0, False)
    assert got[1] == (2, 0, 0, 0, True)
    assert got[2] == (0, 2, 0, 0, True)
    assert got[3] == (0, 0, 3, 0, True)
    assert got[4] == (1, 1, 1, 0, True)
    # only the Luhn-valid candidate counts
    assert got[5] == (0, 0, 0, 1, True)


def test_redact_exact_output(spark):
    rows = [
        (0, "reach a@b.io or +1-212-555-0199 from 10.1.2.3 now"),
        (1, "clean text stays byte-identical"),
    ]
    got = {
        r["id"]: (r["clean_text"], r["n_redactions"])
        for r in pii_redact(_frame(spark, rows), "id", "text").collect()
    }
    assert got[0] == ("reach <EMAIL> or <PHONE> from <IP> now", 3)
    assert got[1] == ("clean text stays byte-identical", 0)


def test_card_luhn_validation(spark):
    """Luhn-valid candidates redact; card-shaped Luhn failures are
    true negatives and survive byte-identically. A duplicated valid
    card counts once per OCCURRENCE and every occurrence is
    scrubbed."""
    rows = [
        (0, "pay 4111-1111-1111-1111 retry 4111-1111-1111-1111 done"),
        (1, "declined 4111-1111-1111-1112 kept on record"),
        (2, "amex-style 5500-0000-0000-0004 cleared"),
    ]
    got = {
        r["id"]: (r["clean_text"], r["n_redactions"])
        for r in pii_redact(_frame(spark, rows), "id", "text").collect()
    }
    assert got[0] == ("pay <CARD> retry <CARD> done", 2)
    assert got[1] == ("declined 4111-1111-1111-1112 kept on record", 0)
    assert got[2] == ("amex-style <CARD> cleared", 1)


def test_redact_email_before_ip_order(spark):
    # a dotted-quad inside an email's domain must be consumed by the
    # EMAIL replacement (emails redact first), not split by the IP
    # pass — and counted exactly ONCE: each pass counts on the text as
    # it exists when that pass runs, so the nested quad contributes no
    # phantom redaction
    rows = [
        (0, "user@1.2.3.4.example.com logged in"),
        (1, "standalone 1.2.3.4 plus a@b.io"),
    ]
    got = {
        r["id"]: (r["clean_text"], r["n_redactions"])
        for r in pii_redact(_frame(spark, rows), "id", "text").collect()
    }
    assert got[0] == ("<EMAIL> logged in", 1)
    assert got[1] == ("standalone <IP> plus <EMAIL>", 2)


def test_synth_notes_class_coverage(spark):
    notes = synth_crm_notes(spark, "/root/testdata/sf0.001")
    scanned = pii_scan(notes, "c_custkey", "note")
    counts = (
        scanned.select(
            (F.col("c_custkey") % 6).alias("cls"),
            "n_emails",
            "n_phones",
            "n_ipv4",
            "n_cards",
        )
        .groupBy("cls")
        .agg(
            F.sum("n_emails").alias("e"),
            F.sum("n_phones").alias("p"),
            F.sum("n_ipv4").alias("i"),
            F.sum("n_cards").alias("c"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    by_cls = {r["cls"]: (r["e"], r["p"], r["i"], r["c"]) for r in counts}
    n_cls = {r["cls"]: r["n"] for r in counts}
    assert by_cls[0] == (0, 0, 0, 0)
    assert by_cls[1][0] > 0 and by_cls[1][1:] == (0, 0, 0)
    assert by_cls[2][1] > 0 and by_cls[2][0] == 0 and by_cls[2][2:] == (0, 0)
    assert by_cls[3][2] > 0 and by_cls[3][0] == 0 and by_cls[3][3] == 0
    assert all(v > 0 for v in by_cls[4][:3]) and by_cls[4][3] == 0
    # card class: exactly ONE valid card per note (the planted Luhn
    # failure must never count)
    assert by_cls[5][:3] == (0, 0, 0) and by_cls[5][3] == n_cls[5]


def test_registry_faces_shape(spark):
    notes = synth_crm_notes(spark, "/root/testdata/sf0.001")
    rep = pii_scan_report(spark, "/root/testdata/sf0.001").collect()
    # one row per market segment PRESENT in the fixture (not a
    # hardcoded 5 — dataset-population-independent)
    assert len(rep) == notes.select("c_mktsegment").distinct().count()
    assert len(rep) > 0
    assert all(r["n_with_pii"] <= r["n_notes"] for r in rep)
    assert sum(r["n_emails"] for r in rep) > 0
    assert sum(r["n_cards"] for r in rep) > 0
    aud = pii_redaction_audit(spark, "/root/testdata/sf0.001")
    rows = aud.collect()
    assert len(rows) > 0
    assert all(len(r["clean_md5"]) == 32 for r in rows)


def test_redacted_notes_scan_clean(spark):
    """Re-scanning redacted notes finds ZERO remaining PII — the
    property the whole pass exists for."""
    red = pii_redact(
        synth_crm_notes(spark, "/root/testdata/sf0.001"),
        "c_custkey",
        "note",
    )
    rescan = pii_scan(red, "c_custkey", "clean_text")
    assert rescan.where(F.col("has_pii")).count() == 0
