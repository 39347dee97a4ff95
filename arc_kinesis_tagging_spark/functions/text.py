"""Text-analysis column expressions for large-scale document pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM
whole-stage-codegen; no Python in the loop). Where a stable cross-engine
hash is needed (fingerprints, minhash), we derive 64-bit integers from
``md5`` hex — identical in every engine — rather than engine-private
hash functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A tiny embedded English stopword list — enough for quality heuristics
# without external models (none are available in this container).
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are",
    "was", "were", "be", "on", "for", "with", "as", "at", "by",
    "it", "this", "that",
]


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty strings removed."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != F.lit(""))


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings (for MinHash / Jaccard dedup).

    Documents with fewer than ``n`` tokens yield an empty array. The
    empty case must be guarded explicitly: ``sequence(1, 0)`` in Spark
    steps DOWN (produces ``[1, 0]``), so the naive
    ``sequence(1, greatest(m, 0))`` would index past the token array
    and abort the job on any short document.
    """
    toks = tokens(text)
    m = F.size(toks) - F.lit(n - 1)
    idx = F.when(m >= 1, F.sequence(F.lit(1), m)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))
    )


def stable_hash64(s: Column) -> Column:
    """Portable 60-bit integer hash: first 15 hex chars of md5.

    md5 is bit-identical across Spark, DuckDB, and Python — unlike
    xxhash64/murmur which are engine-private — so oracle SQL can
    reproduce it with ``cast('0x' || substr(md5(x),1,15) as bigint)``.
    """
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def token_count_exprs(text: Column) -> dict[str, Column]:
    """Token-count family: whitespace tokens and a BPE-ish subword count.

    The BPE-ish count approximates subword tokenizers by counting
    letter-runs, digit-runs, and punctuation separately (a cheap,
    SQL-expressible stand-in for tiktoken-style counts).
    """
    return {
        "ws_tokens": F.size(tokens(text)),
        "bpe_ish_tokens": F.regexp_count(text, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")),
        "n_chars": F.length(text),
    }


def quality_score_expr(text: Column) -> dict[str, Column]:
    """Document quality heuristics: length, punctuation density,
    stopword ratio, mean word length, alpha ratio.

    Deterministic, SQL-expressible (exact DuckDB oracle), and cheap at
    100 TB: one pass over the string per metric, all codegen'd.
    """
    toks = tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    n_punct = F.regexp_count(text, F.lit(r"[^\w\s]"))
    n_alpha = F.regexp_count(text, F.lit(r"[A-Za-z]"))
    safe_tok = F.greatest(n_tok, F.lit(1))
    return {
        "n_tokens": n_tok,
        "stopword_ratio": (n_stop.cast("double") / safe_tok),
        "punct_ratio": (n_punct.cast("double") / F.greatest(n_chars, F.lit(1))),
        "alpha_ratio": (n_alpha.cast("double") / F.greatest(n_chars, F.lit(1))),
        "mean_word_len": (
            F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
            .cast("double") / safe_tok
        ),
    }


def text_metrics_struct(text: Column) -> Column:
    """All token-derived quality metrics as ONE struct column with the
    token array bound to a lambda variable — the tokenization runs once
    per row instead of once per metric (Catalyst projection collapse
    would otherwise inline the split per consumer; see
    operators/dedup.py for the same pattern)."""
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])

    def from_toks(toks: Column) -> Column:
        n_tok = F.size(toks)
        safe_tok = F.greatest(n_tok, F.lit(1))
        n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
        return F.struct(
            n_tok.alias("n_tokens"),
            (n_stop.cast("double") / safe_tok).alias("stopword_ratio"),
            (
                F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
                .cast("double") / safe_tok
            ).alias("mean_word_len"),
        )

    return F.element_at(F.transform(F.array(tokens(text)), from_toks), 1)


def language_id_expr(text: Column) -> Column:
    """Heuristic language ID via character-class ratios.

    A real deployment plugs a fastText-style model in as a pandas UDF;
    this built-in heuristic keeps the hot path JVM-side and is exactly
    reproducible in the SQL oracle: CJK chars -> zh, hangul -> ko,
    kana -> ja, cyrillic -> ru, arabic -> ar, high-latin-accent -> es/fr
    bucket, else en.
    """
    n = F.greatest(F.length(text), F.lit(1)).cast("double")
    cjk = F.regexp_count(text, F.lit(r"[\x{4E00}-\x{9FFF}]")).cast("double") / n
    hangul = F.regexp_count(text, F.lit(r"[\x{AC00}-\x{D7AF}]")).cast("double") / n
    kana = F.regexp_count(text, F.lit(r"[\x{3040}-\x{30FF}]")).cast("double") / n
    cyr = F.regexp_count(text, F.lit(r"[\x{0400}-\x{04FF}]")).cast("double") / n
    arab = F.regexp_count(text, F.lit(r"[\x{0600}-\x{06FF}]")).cast("double") / n
    accents = F.regexp_count(text, F.lit(r"[àáâãäåèéêëìíîïòóôõöùúûüñç]")).cast("double") / n
    return (
        F.when(cjk > 0.05, F.lit("zh"))
        .when(hangul > 0.05, F.lit("ko"))
        .when(kana > 0.05, F.lit("ja"))
        .when(cyr > 0.05, F.lit("ru"))
        .when(arab > 0.05, F.lit("ar"))
        .when(accents > 0.02, F.lit("romance"))
        .otherwise(F.lit("en"))
    )


def fingerprint_expr(text: Column) -> Column:
    """Order-sensitive 60-bit document fingerprint.

    XOR of position-salted stable token hashes — a set/sequence
    fingerprint reproducible in DuckDB SQL (bit_xor over unnest WITH
    ORDINALITY). Used for cheap exact-ish dedup keys at scale where
    hashing the full text is undesirable (e.g. after normalization).
    """
    toks = tokens(text)
    # Guard the empty case: sequence(1, 0) steps DOWN to [1, 0], which
    # would send element_at past the empty token array and abort the
    # job on any blank/whitespace-only document.
    idx = F.when(F.size(toks) >= 1, F.sequence(F.lit(1), F.size(toks))).otherwise(
        F.array().cast("array<int>")
    )
    hashed = F.transform(
        idx, lambda i: stable_hash64(F.concat_ws(":", i.cast("string"), F.element_at(toks, i)))
    )
    return F.aggregate(hashed, F.lit(0).cast("long"), lambda acc, h: acc.bitwiseXOR(h))


# PII patterns, shared between scrub expressions and their SQL oracles.
# Keep in sync with the oracle strings in plans/llmops.py.
PII_PATTERNS = {
    # (pattern, replacement)
    "email": (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    "digits": (r"\b\d{6,}\b", "<NUM>"),
}


def pii_scrub_exprs(text: Column) -> dict[str, Column]:
    """Scrub PII-ish spans (emails, phone shapes, long digit runs) and
    count what was redacted. Pure ``regexp_replace``/``regexp_count``
    chain — JVM codegen, order-independent per row, trivially
    SQL-portable. Patterns are deliberately conservative (a training
    corpus scrubber should over-match inside its target classes, never
    rewrite prose): each class replaces with a typed sentinel so
    downstream token statistics can still see that something was there.
    """
    counts = {
        f"n_{name}": F.regexp_count(text, F.lit(pat)).cast("long")
        for name, (pat, _) in PII_PATTERNS.items()
    }
    scrubbed = text
    for pat, repl in PII_PATTERNS.values():
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return {"scrubbed": scrubbed, **counts}
