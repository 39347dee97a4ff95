"""WordPiece tokenizer training + encoding as DataFrame loops —
completing the industry tokenizer trio next to BPE (operators/bpe.py,
frequency-scored merges) and unigram-LM (operators/unigram.py,
top-down EM): WordPiece is the LIKELIHOOD-scored bottom-up variant
(Schuster & Nakajima 2012; the BERT tokenizer), merging the pair that
maximizes count(ab) / (count(a) * count(b)) — the pair whose merge
most increases corpus likelihood under a unigram model — rather than
raw pair frequency.

Scale shape is exactly bpe_train's: the corpus is touched ONCE (the
word-frequency aggregate, one shuffle to a vocabulary-sized distinct-
word table whose size is corpus-independent), and every merge
iteration runs two bounded aggregates on that state (pair counts +
symbol counts, joined for the likelihood score) with the argmax
returning to the driver as ONE row. Encoding is the BERT RUNTIME
algorithm — greedy longest-match-first against the trained vocab with
``##`` continuation prefixes and ``[UNK]`` fallback — map-only,
closure-captured vocab, per-batch word memoization, no shuffle.

Determinism: counts are exact integers; the score is their ratio
computed identically for every partitioning of the same state, with
ties broken (count desc, left, right) — so the merge trajectory is
partitioning- and run-stable (pinned in tests/test_wordpiece.py along
with single-machine reference parity and the greedy maximal-munch
property).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.functions.text import tokens

UNK = "[UNK]"
CONT = "##"

# Bound on the per-partition word-memoization cache in
# ``wordpiece_encode`` — ~64k entries of short piece lists is a few MB;
# past it the cache is dropped and restarted (hit rate on Zipfian text
# barely notices; adversarially-unique vocabularies stay bounded).
_MEMO_CAP = 1 << 16


def _word_symbols(word: str) -> list[str]:
    """BERT convention: first char plain, continuations ##-prefixed."""
    return [word[0]] + [CONT + c for c in word[1:]]


def _merge_symbols(left: str, right: str) -> str:
    return left + (right[len(CONT):] if right.startswith(CONT) else right)


def _word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    words = df.select(F.explode(tokens(F.col(text_col))).alias("word"))
    first = F.substring("word", 1, 1)
    rest = F.expr("substring(word, 2)")
    conts = F.filter(
        F.transform(
            F.split(rest, ""),
            lambda c: F.concat(F.lit(CONT), c),
        ),
        lambda s: s != F.lit(CONT),
    )
    return (
        words.filter(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(
            F.concat(F.array(first), conts).alias("syms"),
            "freq",
        )
    )


def _apply_merge(left: str, right: str):
    merged = _merge_symbols(left, right)

    def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for syms in pdf["syms"]:
                syms = list(syms)
                res = []
                i = 0
                n = len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                        res.append(merged)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            yield pd.DataFrame({"syms": out, "freq": pdf["freq"]})

    return apply


def wordpiece_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
    min_count: int = 2,
):
    """Learn ``n_merges`` likelihood-scored merges. Returns
    (merges list of (left, right, pair_count, score), vocab set of
    all symbols ever in the state — the encode-side vocabulary).

    Per iteration both aggregates run over the vocabulary-sized state:
    pair counts (explode adjacent pairs weighted by word freq) and
    symbol counts (explode symbols weighted by freq); the score joins
    them. Stops early when the best pair's count falls below
    ``min_count`` (rare-pair merges are noise AND their tiny
    denominators would otherwise dominate the likelihood ratio)."""
    state = _word_vocab(df, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int, float]] = []
    vocab: set[str] = {
        s
        for row in state.select(
            F.explode("syms").alias("s")
        ).distinct().collect()
        for s in [row["s"]]
    }  # alphabet-sized collect
    for _ in range(n_merges):
        pairs = state.select(
            "freq",
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, F.size("syms") - 1),
                    F.slice("syms", 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
        )
        pc = pairs.groupBy("p.l", "p.r").agg(F.sum("freq").alias("cnt"))
        sc = (
            state.select("freq", F.explode("syms").alias("s"))
            .groupBy("s")
            .agg(F.sum("freq").alias("sc"))
        )
        best = (
            pc.filter(F.col("cnt") >= min_count)
            .join(F.broadcast(sc).withColumnRenamed("s", "l"), "l")
            .withColumnRenamed("sc", "cl")
            .join(
                F.broadcast(sc).withColumnRenamed("s", "r"), "r"
            )
            .withColumnRenamed("sc", "cr")
            # exact-integer inputs -> the double ratio is computed
            # identically under any partitioning; ties break on
            # (cnt desc, l, r) so the trajectory never forks
            .withColumn(
                "score",
                F.col("cnt") / (F.col("cl") * F.col("cr")).cast("double"),
            )
            .orderBy(
                F.col("score").desc(), F.col("cnt").desc(),
                F.col("l"), F.col("r"),
            )
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right = best[0]["l"], best[0]["r"]
        merges.append(
            (left, right, int(best[0]["cnt"]), float(best[0]["score"]))
        )
        vocab.add(_merge_symbols(left, right))
        state = state.mapInPandas(
            _apply_merge(left, right), "syms array<string>, freq long"
        ).localCheckpoint(eager=True)
    return merges, vocab


def wordpiece_encode(
    df: DataFrame,
    vocab: set,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_word_chars: int = 100,
) -> DataFrame:
    """BERT's runtime WordPiece algorithm: per word, greedily take the
    LONGEST vocab prefix (continuations matched with the ``##``
    prefix); any position with no match — or a word longer than
    ``max_word_chars`` — encodes as one ``[UNK]``. Map-only: vocab is
    closure-captured, words memoized per partition with a bounded
    cache (dropped and restarted past ``_MEMO_CAP`` entries, so
    heavy-tailed corpora with unbounded distinct words cannot grow
    executor memory), no shuffle. Emits per-document
    (n_words, n_pieces, n_unk, sample_pieces)."""
    vocab = frozenset(vocab)

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        cache: dict[str, list[str]] = {}

        def encode_word(w: str) -> list[str]:
            got = cache.get(w)
            if got is not None:
                return got
            if len(cache) >= _MEMO_CAP:  # bound executor memory on
                cache.clear()            # heavy-tailed vocabularies
            if len(w) > max_word_chars:
                cache[w] = out = [UNK]
                return out
            out = []
            i = 0
            while i < len(w):
                pre = CONT if i > 0 else ""
                j = len(w)
                piece = None
                while j > i:
                    cand = pre + w[i:j]
                    if cand in vocab:
                        piece = cand
                        break
                    j -= 1
                if piece is None:
                    out = [UNK]
                    break
                out.append(piece)
                i = j
            cache[w] = out
            return out

        for pdf in batches:
            rows = []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                # ASCII class pinned to RE2's \s ([ \t\n\f\r]) so word
                # boundaries agree with the DuckDB oracle's
                # string_split_regex(text, '\s+') on non-ASCII
                # whitespace (Python \s would also split on VT/NEL/
                # NBSP and fork n_words/n_pieces across engines).
                words = [w for w in re.split("[ \t\n\f\r]+", text or "") if w]
                n_pieces = 0
                n_unk = 0
                sample: list[str] = []
                for w in words:
                    ps = encode_word(w)
                    n_pieces += len(ps)
                    n_unk += sum(1 for p in ps if p == UNK)
                    if len(sample) < 10:
                        sample.extend(ps[: 10 - len(sample)])
                rows.append(
                    (rid, len(words), n_pieces, n_unk, "|".join(sample))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_words", "n_pieces", "n_unk", "sample_pieces",
                ],
            )

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, text_col).mapInPandas(
        enc,
        f"{id_col} {id_type}, n_words long, n_pieces long, n_unk long, "
        "sample_pieces string",
    )
