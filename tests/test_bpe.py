"""BPE merge induction: the distributed trainer must reproduce the
classic sequential BPE algorithm exactly (leftmost-first application,
count-then-lexicographic tie-break)."""

from collections import Counter

from doeecommerce_datapipeline_spark.operators.textops import (
    bpe_merge_table,
    bpe_merges,
)


def _ref_bpe(word_freqs: dict[str, int], n: int):
    """Reference sequential trainer (the textbook algorithm)."""
    words: dict[tuple, int] = {}
    for w, f in word_freqs.items():
        words[tuple(w)] = words.get(tuple(w), 0) + f
    merges = []
    for rank in range(n):
        pc: Counter = Counter()
        for syms, f in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (a, b), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, a + b, cnt))
        new: dict[tuple, int] = {}
        for syms, f in words.items():
            out: list = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new[tuple(out)] = new.get(tuple(out), 0) + f
        words = new
    return merges


def test_bpe_matches_reference_trainer(spark):
    texts = [
        "low low low lower lower lowest",
        "new newer newest new new",
        "wide wider widest low new",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    wf: Counter = Counter()
    for t in texts:
        wf.update(t.split())
    expect = _ref_bpe(dict(wf), 6)
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in bpe_merge_table(docs, "doc_id", "text", 6)
        .orderBy("rank")
        .collect()
    ]
    assert got == expect, f"\ngot:    {got}\nexpect: {expect}"


def test_bpe_overlapping_pairs_leftmost_first(spark):
    """'aaaa'×3: merge 1 must be (a,a) with count 9 (three per word,
    leftmost-first — NOT 3 overlapping pairs merged), merge 2 (aa,aa)."""
    docs = spark.createDataFrame(
        [(0, "aaaa aaaa aaaa")], "doc_id long, text string"
    )
    got = [
        (r["left"], r["right"], r["pair_count"])
        for r in bpe_merge_table(docs, "doc_id", "text", 2)
        .orderBy("rank")
        .collect()
    ]
    assert got == [("a", "a", 9), ("aa", "aa", 3)]


def test_bpe_registry_shape(spark):
    out = bpe_merges(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) == 8
    assert [r["rank"] for r in rows] == list(range(8))
    # counts must be non-increasing (each merge consumes mass)
    counts = [r["pair_count"] for r in rows]
    assert all(c > 0 for c in counts)


def test_bpe_tokenize_matches_reference_apply(spark):
    """Train on a corpus, apply the merges with the Spark fold, and
    compare per-doc subword counts to a reference Python apply."""
    from doeecommerce_datapipeline_spark.operators.textops import bpe_tokenize

    texts = [
        "low low lower lowest new newer",
        "newest wide wider low new low",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    wf: Counter = Counter()
    for t in texts:
        wf.update(t.split())
    merges = [(a, b) for _, a, b, _, _ in _ref_bpe(dict(wf), 5)]

    def ref_count(text):
        n = 0
        for w in text.split():
            syms = list(w)
            for a, b in merges:
                out = []
                for s in syms:
                    if out and out[-1] == a and s == b:
                        out[-1] = a + b
                    else:
                        out.append(s)
                syms = out
            n += len(syms)
        return n

    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_tokenize(docs, "doc_id", "text", merges).collect()
    }
    expect = {i: ref_count(t) for i, t in enumerate(texts)}
    assert got == expect
    # merges actually compress: fewer subwords than characters
    chars = {i: sum(len(w) for w in t.split()) for i, t in enumerate(texts)}
    assert all(got[i] < chars[i] for i in got)


def test_bpe_local_equals_distributed_loop(spark):
    """The hybrid trainer's two paths — driver-side loop (vocab under
    BPE_LOCAL_VOCAB_CAP) and per-round distributed loop — must emit the
    identical merge table: same winners, same tie-breaks, same counts."""
    texts = [
        "low low low lower lower lowest",
        "new newer newest new new",
        "wide wider widest low new",
        "aaaa aaaa abab abab abab",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    key = lambda df: [  # noqa: E731
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in df.orderBy("rank").collect()
    ]
    local = key(bpe_merge_table(docs, "doc_id", "text", 6))
    dist = key(
        bpe_merge_table(docs, "doc_id", "text", 6, local_vocab_cap=0)
    )
    assert local == dist and len(local) == 6
