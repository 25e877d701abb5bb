"""Text-analysis expressions for large-scale training-data pipelines.

All pure Column expressions (JVM-side, codegen'd) — language ID,
quality scoring, token counting, fingerprinting. No Python UDFs: at
100 TB these run inside whole-stage codegen next to the parquet scan.

Extension surface beyond the reference (BASELINE.json north star);
operates on the `documents` test table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization. split(trim(x), '\\s+')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        F.size(tokens(c))
    ).cast("long")


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish subword proxy: count of word-piece matches
    (letter-runs, digit-runs, single punctuation) — the standard
    regex pre-tokenizer shape used by BPE tokenizers."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")).cast("long")


def avg_token_len(col: Column | str) -> Column:
    """Mean token length = len(text without whitespace) / token count."""
    c = F.col(col) if isinstance(col, str) else col
    n = token_count(c)
    return F.when(n > 0, F.length(F.regexp_replace(c, r"\s+", "")) / n)


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars / total chars (quality signal)."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.length(c)
    punct = total - F.length(F.regexp_replace(c, r"[!-/:-@\[-`{-~]", ""))
    return F.when(total > 0, punct / total).otherwise(F.lit(0.0))


# Small per-language stopword marker sets. Word-boundary regexes keep
# the scoring a single codegen'd pass; counts are exact integers so the
# argmax is engine-independent.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "los", "que", "de"],
    "fr": ["le", "la", "les", "des", "est"],
    "de": ["der", "die", "das", "und", "ist"],
    "zh": ["de", "shi", "le", "bu", "wo"],
}


def lang_marker_count(col: Column | str, lang: str) -> Column:
    """Exact count of language-marker word hits."""
    c = F.col(col) if isinstance(col, str) else col
    pattern = r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
    return F.regexp_count(F.lower(c), F.lit(pattern)).cast("long")


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    """Marker-stopword hits / token count (quality signal)."""
    c = F.col(col) if isinstance(col, str) else col
    n = token_count(c)
    return F.when(n > 0, lang_marker_count(c, lang) / n).otherwise(F.lit(0.0))


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.

    Content-defined, order-free — the exact-dedup key. (The reference's
    dedup keys on business ids, transform_silver.py:28-30; a content
    fingerprint is the training-data analog.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as array<string> — the MinHash /
    Jaccard unit. Documents shorter than n words yield the whole text
    as one shingle."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(F.lower(c))
    # bind the token array ONCE as a lambda variable: referencing the
    # split expression inside the per-gram lambda re-tokenizes the
    # whole document per gram (O(len²) per doc — measured 2.9 s → 0.4 s
    # on the sf0.1 shingle explode)
    return F.element_at(
        F.transform(
            F.array(toks),
            lambda t: F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(F.size(t) - (n - 1), F.lit(1)),
                    ),
                    lambda i: F.array_join(F.slice(t, i, n), " "),
                )
            ),
        ),
        1,
    )


def bigrams(col: Column | str) -> Column:
    """Adjacent-token bigrams as array<struct<w1,w2>> (lowercased,
    whitespace-tokenized). Empty array for documents with fewer than
    two tokens: the two shifted slices are each size-1 elements long
    (zero when size is 1), so there is NO index arithmetic to go out
    of bounds — ``transform(sequence(1, size-1), i -> t[i])`` crashes
    under ANSI mode when size == 1 because sequence(1, 0) counts DOWN
    to [1, 0] and evaluates t[-1]/t[size].
    """
    c = F.col(col) if isinstance(col, str) else col
    t = tokens(F.lower(c))
    n = F.size(t)
    return F.zip_with(
        F.slice(t, 1, n - 1),
        F.slice(t, F.lit(2), n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


def content_bucket(fp_col: Column | str) -> Column:
    """0-99 bucket from a content fingerprint (first 8 hex chars of the
    md5) — the deterministic, engine-portable assignment unit shared by
    hash_split and the corpus-prep pipeline (one definition, so the
    80/10/10 thresholds can never drift between them)."""
    c = F.col(fp_col) if isinstance(fp_col, str) else fp_col
    return F.conv(F.substring(c, 1, 8), 16, 10).cast("long") % 100


def bucket_split(bucket_col: Column) -> Column:
    """80/10/10 train/val/test assignment for a content bucket."""
    return (
        F.when(bucket_col < 80, "train")
        .when(bucket_col < 90, "val")
        .otherwise("test")
    )
