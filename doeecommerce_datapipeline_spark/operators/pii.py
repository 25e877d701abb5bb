"""Text-level PII detection and redaction — the privacy pass every
LLM training-data pipeline runs before a corpus leaves the building
(emails, phone numbers, IP addresses scrubbed to typed placeholders;
counts kept for the audit trail). The row-identifier pseudonymization
sibling lives at ``corpus.pseudonymize_events``; THIS module handles
PII embedded in free text, which only pattern matching can find.

Reference scope: the reference pipeline has no free-text PII surface
(its ``users`` silver table keeps raw emails: ``database/db_setup.py``
silver.users DDL) — this is part of the LLM-extension surface, built
Spark-first: per-row ``regexp_count`` / ``regexp_replace`` expressions
(JVM codegen, scan-bound, zero shuffles for the per-doc pass; one
hash-agg exchange for the rollup). At 100 TB the scan dominates and
parallelizes embarrassingly; there is no state, no UDF, no collect.

Cross-engine exactness: every pattern is written in the Java-regex ∩
RE2 common subset (character classes, bounded/unbounded greedy
repetition, non-capturing groups only — no backreferences, no
lookaround, no \\b) so Spark (java.util.regex) and the DuckDB oracle
(RE2) find the IDENTICAL match set; both engines use leftmost,
greedy-with-backtracking-semantics matching for these constructs, and
replacement order (email → ipv4 → phone → card) is fixed so composed
redactions agree byte-for-byte.

Credit cards (r7, per the r6 verdict #5) are a two-stage class: the
regex finds CANDIDATES (four dash-separated 4-digit groups) and a
Luhn checksum — an array-native ``transform``/``aggregate`` digit
fold, zero UDFs — validates them; only Luhn-valid candidates are
counted and redacted (a card-shaped string that fails Luhn is a true
negative: every real PAN passes Luhn). Replacement is a fold of
literal ``replace`` calls over the validated candidate list, still a
pure per-row projection.

The registry faces run over a DETERMINISTIC synthetic CRM-notes view
built from the ``customer`` table (the driver corpus's ``documents``
text is digit-free word salad — a PII scan over it would parity-pass
vacuously; the synth-notes view interleaves key-derived phone/email/IP
strings into one-fifth-each coverage classes, the same
fixture-from-columns pattern as ``multimodal.media.synth_image_table``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table

# Java ∩ RE2 subset — see module docstring. Kept as single-source
# constants: the oracle SQL templates below interpolate THESE strings,
# so Spark and DuckDB can never drift onto different patterns.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "(?:[0-9]{1,3}\\.){3}[0-9]{1,3}"
PHONE_RE = "\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"
CARD_RE = "[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"
CARD_TOKEN = "<CARD>"


def _luhn_sum(digit_str):
    """Luhn weighted digit sum of a digit string, with 16-digit-PAN
    parity: 0-based even indices double (digits >9 after doubling
    drop 9). Pure ``transform`` + ``aggregate`` fold — JVM codegen,
    no UDF. For a full 16-digit candidate, valid ⇔ sum % 10 == 0;
    for the fixture's 15 base digits (indices 0..14, same parity
    map), the check digit is (10 - sum % 10) % 10."""

    def weigh(ch, i):
        d = ch.cast("int")
        return F.when(
            i % 2 == 0, F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
        ).otherwise(d)

    return F.aggregate(
        F.transform(F.split(digit_str, ""), weigh),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def luhn_valid(cand):
    """True iff a dash-separated 16-digit candidate passes Luhn."""
    return _luhn_sum(F.regexp_replace(cand, "-", "")) % 10 == 0


def _valid_cards(t):
    """Luhn-validated card candidates in a text column, one entry per
    OCCURRENCE (regexp_extract_all order), filtered by the digit
    fold."""
    return F.filter(
        F.regexp_extract_all(t, F.lit(CARD_RE), F.lit(0)), luhn_valid
    )


def _redact_cards(t):
    """Fold literal ``replace`` over the validated candidates — only
    Luhn-valid candidates are scrubbed; card-shaped Luhn failures stay
    (true negatives). A duplicate candidate is replaced everywhere by
    its first fold step (later steps no-op), matching the
    occurrence-counting scan."""
    return F.aggregate(
        _valid_cards(t),
        t,
        lambda acc, c: F.replace(acc, c, F.lit(CARD_TOKEN)),
    )


def synth_crm_notes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic CRM-notes fixture over ``customer``: one free-text
    note per customer whose PII content class is ``c_custkey % 6`` —
    0 = no PII, 1 = email only, 2 = phone only, 3 = IP only,
    4 = email+phone+IP, 5 = payment cards (one Luhn-VALID card that
    must be redacted and one card-shaped Luhn FAILURE that must
    survive — the class that exercises the validator both ways).
    Phone/IP/card digits derive from the key via integer multiply-mod
    (non-negative operands, so Spark ``%`` ≡ DuckDB ``%``), the card's
    check digit from the Luhn fold over its 15 base digits, the email
    from ``lower(c_name)`` with '#' → '.'; every branch is a pure
    per-row string expression both engines build identically."""
    c = table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    email = F.concat(
        F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit("."))),
        F.lit("@example.com"),
    )
    phone = F.concat(
        F.lit("+1-"),
        ((k * 7919) % 900 + 100).cast("string"),
        F.lit("-"),
        ((k * 104729) % 900 + 100).cast("string"),
        F.lit("-"),
        F.lpad((k % 10000).cast("string"), 4, "0"),
    )
    ip = F.concat(
        F.lit("192.168."),
        ((k * 13) % 256).cast("string"),
        F.lit("."),
        ((k * 31) % 256).cast("string"),
    )
    g1 = F.lpad(((k * 48271) % 10000).cast("string"), 4, "0")
    g2 = F.lpad(((k * 7919) % 10000).cast("string"), 4, "0")
    g3 = F.lpad(((k * 104729) % 10000).cast("string"), 4, "0")
    g4 = F.lpad(((k * 13) % 1000).cast("string"), 3, "0")
    chk = (10 - _luhn_sum(F.concat(g1, g2, g3, g4)) % 10) % 10
    dash = F.lit("-")
    card_ok = F.concat(
        g1, dash, g2, dash, g3, dash, g4, chk.cast("string")
    )
    card_bad = F.concat(
        g1, dash, g2, dash, g3, dash, g4, ((chk + 1) % 10).cast("string")
    )
    cls = k % 6
    note = (
        F.when(
            cls == 0,
            F.concat(
                F.lit("segment review for "),
                F.col("c_mktsegment"),
                F.lit(" account; no contact on file"),
            ),
        )
        .when(
            cls == 1,
            F.concat(F.lit("followup sent to "), email, F.lit(" re renewal")),
        )
        .when(
            cls == 2,
            F.concat(F.lit("call placed to "), phone, F.lit(" after hours")),
        )
        .when(
            cls == 3,
            F.concat(F.lit("last portal login from "), ip, F.lit(" flagged")),
        )
        .when(
            cls == 4,
            F.concat(
                F.lit("escalation: contact "),
                email,
                F.lit(" or "),
                phone,
                F.lit("; session ip "),
                ip,
            ),
        )
        .otherwise(
            F.concat(
                F.lit("payment card "),
                card_ok,
                F.lit(" on file; declined card "),
                card_bad,
                F.lit(" retry advised"),
            )
        )
    )
    return c.select("c_custkey", "c_mktsegment", note.alias("note"))


def pii_scan(frame: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-row PII detection counts: (id, n_emails, n_phones, n_ipv4,
    n_cards, has_pii). One codegen'd projection — ``regexp_count`` per
    regex class plus the Luhn-validated candidate count for cards, no
    shuffle; attach to any (id, text) frame."""
    t = F.col(text_col)
    n_e = F.regexp_count(t, F.lit(EMAIL_RE))
    n_p = F.regexp_count(t, F.lit(PHONE_RE))
    n_i = F.regexp_count(t, F.lit(IPV4_RE))
    n_c = F.size(_valid_cards(t))
    return frame.select(
        F.col(id_col),
        n_e.cast("long").alias("n_emails"),
        n_p.cast("long").alias("n_phones"),
        n_i.cast("long").alias("n_ipv4"),
        n_c.cast("long").alias("n_cards"),
        ((n_e + n_p + n_i + n_c) > 0).alias("has_pii"),
    )


def redact_expr(t):
    """Column-level redaction expression: every email/IPv4/phone match
    and every Luhn-valid card candidate replaced by its typed
    placeholder, in the FIXED order email → ipv4 → phone → card. A
    pure projection — callers that only need the scrubbed text (e.g.
    the corpus-prep 3b stage) apply it with ``withColumn``, zero
    exchanges, no join."""
    return _redact_cards(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(t, EMAIL_RE, EMAIL_TOKEN),
                IPV4_RE,
                IPV4_TOKEN,
            ),
            PHONE_RE,
            PHONE_TOKEN,
        )
    )


def pii_redact(frame: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-row redaction via ``redact_expr``. Returns (id, clean_text,
    n_redactions) where n_redactions counts the replacements each pass
    ACTUALLY performs: emails on the original text, IPv4 on the
    email-redacted text, phones on the email+ip-redacted text, valid
    cards on the email+ip+phone-redacted text — so a pattern embedded
    inside an earlier match (a dotted quad in an email's domain, a
    phone-shaped local part) is never double-counted and Σ
    n_redactions equals the number of placeholder tokens emitted."""
    t = F.col(text_col)
    t1 = F.regexp_replace(t, EMAIL_RE, EMAIL_TOKEN)
    t2 = F.regexp_replace(t1, IPV4_RE, IPV4_TOKEN)
    t3 = F.regexp_replace(t2, PHONE_RE, PHONE_TOKEN)
    n_red = (
        F.regexp_count(t, F.lit(EMAIL_RE))
        + F.regexp_count(t1, F.lit(IPV4_RE))
        + F.regexp_count(t2, F.lit(PHONE_RE))
        + F.size(_valid_cards(t3))
    )
    return frame.select(
        F.col(id_col),
        _redact_cards(t3).alias("clean_text"),
        n_red.cast("long").alias("n_redactions"),
    )


def pii_scan_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry face: market-segment rollup of the PII scan over the
    synth CRM notes — (c_mktsegment, n_notes, n_with_pii, n_emails,
    n_phones, n_ipv4, n_cards). Two-phase hash agg after the
    scan-bound detection projection: one exchange total.
    Non-degenerate by construction (every segment holds all six
    content classes, and the card class plants a Luhn failure next to
    every valid card, so n_cards counts exactly one per card-class
    note — the validator is exercised both ways on every row)."""
    scanned = pii_scan(
        synth_crm_notes(spark, sf_dir), "c_mktsegment", "note"
    )
    return scanned.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_notes"),
        F.sum(F.col("has_pii").cast("long")).alias("n_with_pii"),
        F.sum("n_emails").alias("n_emails"),
        F.sum("n_phones").alias("n_phones"),
        F.sum("n_ipv4").alias("n_ipv4"),
        F.sum("n_cards").alias("n_cards"),
    )


def pii_redaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry face: per-customer redaction audit — (c_custkey,
    n_redactions, clean_len, clean_md5). The md5 of the redacted text
    pins the EXACT output bytes cross-engine (both engines emit
    lowercase-hex md5), so a single placeholder drift or replacement
    -order change hash-mismatches every affected row. Scan-bound,
    shuffle-free."""
    red = pii_redact(
        synth_crm_notes(spark, sf_dir), "c_custkey", "note"
    )
    return red.select(
        "c_custkey",
        "n_redactions",
        F.length("clean_text").cast("long").alias("clean_len"),
        F.md5("clean_text").alias("clean_md5"),
    )
