"""Property-based tests (hypothesis) for the semantics the oracle
can't fuzz: dedup tie-break determinism under shuffling, guarded
division bounds, upsert algebra, union null-handling."""

from datetime import datetime, timedelta
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from doeecommerce_datapipeline_spark.functions.scalars import guarded_pct
from doeecommerce_datapipeline_spark.operators.windows import latest_wins

BASE = datetime(2024, 1, 1)

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),  # key
        st.integers(0, 3),  # ts offset (collisions likely)
        st.integers(0, 10_000),  # unique-ish payload seed
    ),
    min_size=1,
    max_size=30,
)

_settings = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=rows_strategy)
@_settings
def test_latest_wins_deterministic_under_partitioning(spark, rows):
    """Same input in any partitioning/order → same surviving rows."""
    data = [
        (k, BASE + timedelta(hours=ts), i)  # i = unique tiebreaker
        for i, (k, ts, _) in enumerate(rows)
    ]
    df1 = spark.createDataFrame(data, "k long, ts timestamp, uid long")
    df2 = spark.createDataFrame(list(reversed(data)), "k long, ts timestamp, uid long").repartition(7)
    order = [F.col("ts").desc(), F.col("uid").desc()]
    r1 = {(r["k"], r["uid"]) for r in latest_wins(df1, ["k"], order).collect()}
    r2 = {(r["k"], r["uid"]) for r in latest_wins(df2, ["k"], order).collect()}
    assert r1 == r2
    assert len(r1) == len({k for k, _, _ in rows})  # one row per key


@given(
    totals=st.lists(
        st.tuples(
            st.decimals(min_value=0, max_value=10**6, places=2),
            st.decimals(min_value=0, max_value=10**6, places=2),
        ),
        min_size=1,
        max_size=20,
    )
)
@_settings
def test_guarded_pct_bounds_and_zero_guard(spark, totals):
    """pct is NULL-free, 0 when total==0, and equals the exact decimal
    formula otherwise."""
    data = [(Decimal(t), Decimal(d)) for t, d in totals]
    df = spark.createDataFrame(data, "total decimal(15,2), disc decimal(15,2)")
    out = df.select(
        "total", "disc", guarded_pct("total", "disc").alias("pct")
    ).collect()
    for r in out:
        assert r["pct"] is not None
        if r["total"] == 0:
            assert r["pct"] == 0
        else:
            # Spark decimal casts round HALF_UP (java.math.BigDecimal);
            # Python's quantize defaults to HALF_EVEN — pin the mode or
            # exact .5 ticks (e.g. -115.625) diverge by one cent.
            expected = ((r["total"] - r["disc"]) / r["total"] * 100).quantize(
                Decimal("0.01"), rounding=ROUND_HALF_UP
            )
            assert r["pct"] == expected


@given(
    old_keys=st.sets(st.integers(0, 20), min_size=1, max_size=10),
    new_keys=st.sets(st.integers(0, 20), min_size=1, max_size=10),
)
@_settings
def test_upsert_algebra(spark, tmp_path_factory, old_keys, new_keys):
    """After upsert: keys = old ∪ new; every overlapping key carries the
    new payload."""
    from doeecommerce_datapipeline_spark.sinks.parquet_sinks import upsert

    p = str(tmp_path_factory.mktemp("ups") / "t")
    spark.createDataFrame(
        [(k, "old") for k in old_keys], "id long, v string"
    ).write.parquet(p)
    upsert(
        spark,
        spark.createDataFrame([(k, "new") for k in new_keys], "id long, v string"),
        p,
        ["id"],
    )
    got = {r["id"]: r["v"] for r in spark.read.parquet(p).collect()}
    assert set(got) == old_keys | new_keys
    for k in new_keys:
        assert got[k] == "new"
    for k in old_keys - new_keys:
        assert got[k] == "old"


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab x"),  # spaces → variable token counts
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    )
)
@_settings
def test_bigram_count_is_tokens_minus_one(spark, texts):
    """bigrams() must yield exactly max(0, n_tokens - 1) pairs for ANY
    text, where n_tokens is tokens()'s count (split of a blank string
    is [''], so empty/whitespace-only docs count ONE token and must
    yield zero bigrams — the ANSI-mode crash class)."""
    from doeecommerce_datapipeline_spark.functions.text import bigrams, tokens

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    rows = df.select(
        "id",
        F.size(bigrams(F.col("text"))).alias("n_bi"),
        F.size(tokens(F.lower(F.col("text")))).alias("n_tok"),
    ).collect()
    for r in rows:
        assert r["n_bi"] == max(0, r["n_tok"] - 1)


@given(
    toks=st.lists(st.integers(1, 40), min_size=1, max_size=25),
    budget=st.integers(8, 64),
)
@_settings
def test_pack_by_budget_prefix_sum_invariants(spark, toks, budget):
    """For any token-count sequence: seq_id*budget + seq_offset must be
    the exact exclusive prefix sum, offsets stay inside the budget, and
    seq_ids are non-decreasing."""
    from doeecommerce_datapipeline_spark.operators.corpus import pack_by_budget

    df = spark.createDataFrame(
        [(i, "s", " ".join(["w"] * n)) for i, n in enumerate(toks)],
        "id long, src string, text string",
    )
    rows = sorted(
        pack_by_budget(df, "id", "text", ["src"], budget=budget).collect(),
        key=lambda r: r["id"],
    )
    cum = 0
    prev_seq = 0
    for r, n in zip(rows, toks):
        assert r["n_tokens"] == n
        assert r["seq_id"] * budget + r["seq_offset"] == cum
        assert 0 <= r["seq_offset"] < budget
        assert r["seq_id"] >= prev_seq
        prev_seq = r["seq_id"]
        cum += n


@given(
    batches=st.lists(
        st.lists(
            st.tuples(
                st.integers(0, 4),   # key
                st.integers(0, 6),   # ts (collisions likely)
                st.integers(0, 99),  # value
            ),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=4,
    )
)
@_settings
def test_upsert_latest_wins_algebra(spark, tmp_path_factory, batches):
    """Any micro-batch slicing of updates converges to the global
    newest-per-key answer, with earlier arrivals winning ts ties —
    the CDC merge invariant, fuzzed over random batch shapes."""
    from doeecommerce_datapipeline_spark.sinks.manifest_store import ManifestTable

    path = str(tmp_path_factory.mktemp("lw") / "t")
    mt = ManifestTable(spark, path)
    expect: dict[int, tuple[int, int]] = {}
    for batch in batches:
        # within a batch the newest ts wins; among equal-ts rows the
        # operator picks ONE deterministically — mirror by keeping the
        # reduced batch's winner only when strictly newer than current
        reduced: dict[int, tuple[int, int]] = {}
        for k, ts, v in batch:
            if k not in reduced or ts > reduced[k][0]:
                reduced[k] = (ts, v)
        df = spark.createDataFrame(
            [(k, ts, v) for k, ts, v in batch], "k long, ts long, v long"
        )
        mt.upsert_latest_wins(df, ["k"], "ts")
        for k, (ts, v) in reduced.items():
            if k not in expect or ts > expect[k][0]:
                expect[k] = (ts, v)
    got = {r["k"]: (r["ts"],) for r in mt.read().collect()}
    # compare winning timestamps per key (values may differ only when
    # equal-ts rows tie WITHIN a batch, where either is a valid winner)
    assert {k: v[0] for k, v in got.items()} == {
        k: ts for k, (ts, _) in expect.items()
    }


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)),  # (key, payload)
        min_size=1,
        max_size=40,
    ),
    other=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 9)),
        min_size=1,
        max_size=12,
    ),
    hot=st.lists(st.integers(0, 3), max_size=2),
)
@_settings
def test_salted_shuffle_join_equals_plain_join(spark, rows, other, hot):
    """For ANY data and ANY declared hot-key set (even wrongly-declared
    ones), the salted big-big join must equal the plain inner join —
    salting refines partitioning, never semantics."""
    from doeecommerce_datapipeline_spark.operators.skew import (
        salted_shuffle_join,
    )

    big = spark.createDataFrame(
        [(k, i, p) for i, (k, p) in enumerate(rows)], "k long, rid long, p long"
    )
    small = spark.createDataFrame(
        [(k, v) for k, v in other], "k long, ver long"
    )
    plain = sorted(
        (r["k"], r["rid"], r["ver"]) for r in big.join(small, "k").collect()
    )
    salted = sorted(
        (r["k"], r["rid"], r["ver"])
        for r in salted_shuffle_join(
            big, small, "k", n_salts=4, hot_keys=list(set(hot))
        ).collect()
    )
    assert plain == salted


@given(
    docs=st.lists(
        st.lists(st.integers(0, 7), min_size=3, max_size=12),
        min_size=2,
        max_size=10,
    ),
    tau_pct=st.sampled_from([30, 50, 70]),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_prefix_jaccard_lossless_on_random_corpora(spark, docs, tau_pct):
    """PPJoin prefix+length+positional filters must be LOSSLESS: on
    random tiny-vocab corpora (worst case for prefix filtering — every
    shingle is hot) the filtered join equals brute force exactly."""
    from doeecommerce_datapipeline_spark.functions.text import word_shingles
    from doeecommerce_datapipeline_spark.operators.dedup import (
        prefix_jaccard_pairs,
    )

    tau = tau_pct / 100.0
    rows = [(i, " ".join(f"w{t}" for t in toks)) for i, toks in enumerate(docs)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b, r.n_common) for r in prefix_jaccard_pairs(d, tau=tau).collect()
    }
    sets = {
        r.doc_id: set(r.s)
        for r in d.select("doc_id", word_shingles(F.col("text")).alias("s")).collect()
    }
    want = set()
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter and inter / len(sets[a] | sets[b]) >= tau:
                want.add((a, b, inter))
    assert got == want


intervals_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # user
        st.integers(min_value=0, max_value=96),  # start, hours from base
        st.integers(min_value=1, max_value=40),  # duration, hours
    ),
    min_size=1,
    max_size=40,
)


@given(ivs=intervals_strategy)
@_settings
def test_peak_concurrency_sweep_equals_brute_force(spark, ivs):
    """The per-day two-level sweep (running sums + midnight carry-in)
    must equal the brute-force 'evaluate concurrency at every endpoint
    instant' answer on random multi-day intervals — including sessions
    spanning several midnights, zero-length days, and endpoint ties."""
    from datetime import date, timedelta as td

    from doeecommerce_datapipeline_spark.operators.events import (
        peak_concurrency_by_day,
    )

    base = datetime(2024, 3, 1)
    sess = [
        (u, base + td(hours=s), base + td(hours=s + d)) for u, s, d in ivs
    ]
    df = spark.createDataFrame(
        sess, "user_id long, s_start timestamp, s_end timestamp"
    )
    got = {
        r["day"]: (r["carry_in"], r["peak_concurrency"])
        for r in peak_concurrency_by_day(df).collect()
    }
    # brute force: concurrency at instant t = #{[s, e) : s <= t < e};
    # per day, evaluate at every endpoint in the day plus the day's
    # midnight (the carry level), take the max
    days = set()
    for _, s, e in sess:
        d = s.date()
        while d <= e.date():
            days.add(d)
            d += td(days=1)
    want = {}
    for d in sorted(days):
        midnight = datetime(d.year, d.month, d.day)
        instants = [midnight] + [
            t for _, s, e in sess for t in (s, e) if t.date() == d
        ]
        conc = lambda t: sum(1 for _, s, e in sess if s <= t < e)  # noqa: E731
        # carry-in = sessions started STRICTLY before the day and still
        # open at its midnight (a session starting exactly at midnight
        # is the day's own +1 endpoint, not carried)
        carry = sum(1 for _, s, e in sess if s < midnight < e)
        peak = max(conc(t) for t in instants)
        # the operator emits a day iff it has a surviving endpoint (a
        # start on d, or an end on d strictly after midnight) or a
        # positive carry; a day only "touched" by a close at exactly
        # its midnight has no activity and no row
        has_endpoint = any(
            s.date() == d or (e.date() == d and e > midnight)
            for _, s, e in sess
        )
        if carry == 0 and not has_endpoint:
            continue
        want[d] = (carry, peak)
    assert got == want


# ---- round-4 kernels ------------------------------------------------

import duckdb as _duckdb  # noqa: E402

from doeecommerce_datapipeline_spark.operators.dedup import (  # noqa: E402
    _jaro_winkler,
)

_name_strategy = st.text(
    alphabet=st.sampled_from("abcde "), min_size=0, max_size=12
)


@given(a=_name_strategy, b=_name_strategy)
@settings(max_examples=300, deadline=None)
def test_jaro_winkler_matches_native_engine(a, b):
    """The Arrow kernel's JW must equal DuckDB's native
    jaro_winkler_similarity at the 6-dp seam on ARBITRARY strings —
    the fuzz extension of the 10k-real-pairs check in the docstring
    (small alphabet maximizes transposition/window edge cases)."""
    [(want,)] = _duckdb.sql(
        "SELECT jaro_winkler_similarity(?, ?)", params=[a, b]
    ).fetchall()
    got = _jaro_winkler(a, b)
    assert round(got, 6) == round(want, 6), (a, b, got, want)


@given(
    flows=st.lists(st.integers(-50, 50), min_size=1, max_size=40)
)
@settings(max_examples=200, deadline=None)
def test_backlog_prefix_min_closed_form(flows):
    """cum - least(0, running_min(cum)) == the clamp recurrence
    max(0, prev + x) on any flow sequence — the identity
    order_backlog_sweep's window formulation rests on."""
    cum = 0
    runmin = 0
    bl = 0
    for x in flows:
        cum += x
        runmin = min(runmin, cum)
        closed = cum - min(0, runmin)
        bl = max(0, bl + x)
        assert closed == bl
