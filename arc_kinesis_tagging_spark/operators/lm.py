"""ARPA-format (KenLM-compatible) export of the token-bigram LM.

The quality-gate family (``plans/quality_ops.py:q_ngram_lm_score``)
self-trains an add-one-smoothed token-bigram model; production
pipelines want that model as an ARTIFACT — the ARPA text format every
n-gram toolchain (KenLM ``build_binary``/``query``, SRILM, IRSTLM)
consumes — so a gate trained on one corpus snapshot can score the
next. This module exports exactly the distribution the gate scores
with, plus the Katz-normalized backoff weights ARPA requires:

- bigram: p(b|a) = (c(a,b) + 1) / (c(a.) + V)   (the gate's formula)
- unigram: p(w) = (c(w) + 1) / (N + V + 1), with an explicit
  ``<unk>`` entry carrying the +1 mass of an unseen token — the model
  is open-vocabulary, as KenLM requires (it refuses closed-vocab
  models without ``<unk>``).
- backoff: bo(a) = leftover(a) / sum_{b unseen after a} p(w=b), where
  leftover(a) = 1 - sum_{b seen after a} p(b|a) — the unique weight
  making every context's distribution sum to exactly 1 (pinned by a
  pytest invariant), the property that makes an ARPA file a
  probability model rather than a score table.

Scale shape: counts (bigram, context, unigram, leftover-mass) are
Spark aggregates over the corpus — the only corpus-sized work; the
collected result is MODEL-sized (vocabulary + observed bigrams), which
is the exported artifact itself, so the collect is the write. This is
the same shape as any model-training job: the corpus is never
collected, the model necessarily is. Log-probs are written in log10
(the ARPA convention) at 7 decimals, rows sorted lexicographically —
byte-deterministic output for a given corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNK = "<unk>"


def _bigram_counts(docs: DataFrame, text_col: str):
    """(bigram counts, context counts, unigram counts) DataFrames from
    whitespace-tokenized documents — the exact tokenization and
    counting of q_ngram_lm_score so export and gate agree."""
    ts = F.split(F.col(text_col), " ")
    bigrams = F.when(
        F.size(ts) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ts) - 1),
            lambda i: F.struct(
                F.element_at(ts, i).alias("ta"),
                F.element_at(ts, i + 1).alias("tb"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<ta:string,tb:string>>"))
    bg = docs.select(F.explode(bigrams).alias("b")).select(
        F.col("b.ta").alias("ta"), F.col("b.tb").alias("tb")
    )
    nab = bg.groupBy("ta", "tb").agg(F.count(F.lit(1)).alias("nab"))
    na = bg.groupBy("ta").agg(F.count(F.lit(1)).alias("na"))
    uni = docs.select(F.explode(ts).alias("t")).groupBy("t").agg(
        F.count(F.lit(1)).alias("n")
    )
    return nab, na, uni


def export_arpa_bigram(
    docs: DataFrame, path: str, text_col: str = "text",
    prune_count: int = 0,
) -> str:
    """Train the add-one token-bigram model on ``docs`` and write it
    to ``path`` in ARPA format. Returns ``path``.

    The heavy lifting (counts) is distributed; the collected model is
    vocabulary/bigram-sized by construction (it IS the artifact being
    written). Deterministic: lexicographic token order, fixed 7-dp
    log10 formatting.

    ``prune_count`` is KenLM's ``--prune``: bigrams with count <=
    prune_count are DROPPED from the model and their probability mass
    folds into the context's Katz backoff weight (estimated-then-
    pruned, the KenLM order of operations, so retained probabilities
    are unchanged). Singleton pruning (prune_count=1) is the standard
    production setting — on a heavy-tailed vocabulary it shrinks the
    bigram table by the singleton fraction, and crucially it BOUNDS
    the collected model on corpora whose raw bigram table grows with
    corpus size (each retained bigram was seen >= 2x, so the table
    saturates where the raw one keeps growing — the round-8 ladder's
    q_lm_arpa entry measures exactly this effect). The pruning filter
    runs DISTRIBUTED, before the collect, so the driver never holds
    the unpruned table."""
    nab_df, na_df, uni_df = _bigram_counts(docs, text_col)
    if prune_count > 0:
        nab_df = nab_df.filter(F.col("nab") > prune_count)

    uni = {r["t"]: r["n"] for r in uni_df.collect()}  # model-sized
    nab = {
        (r["ta"], r["tb"]): r["nab"] for r in nab_df.collect()
    }  # model-sized (post-prune)
    na = {r["ta"]: r["na"] for r in na_df.collect()}  # model-sized

    vocab = sorted(uni)
    V = len(vocab)
    N = sum(uni.values())

    def quant(x: float) -> float:
        """The value a reader recovers from the 7-dp log10 field. The
        backoff weights are computed from QUANTIZED probabilities so
        the file is self-consistent: each context normalizes to 1 up
        to the single quantization of bo(a) itself (~1e-7 relative),
        not the accumulated quantization of |vocab| terms."""
        return 10.0 ** float(f"{math.log10(x):.7f}")

    # open-vocabulary unigrams: +1 per seen token, +1 for <unk>
    def p_uni(w: str) -> float:
        return quant((uni.get(w, 0) + 1) / (N + V + 1))

    # seen-bigram conditional (the gate's formula) and Katz backoff
    def p_bi(a: str, b: str) -> float:
        return quant((nab[(a, b)] + 1) / (na[a] + V))

    succ: dict[str, list[str]] = {}
    for a, b in nab:
        succ.setdefault(a, []).append(b)

    # total unigram mass once; each context's unseen mass is the
    # complement of its SEEN successors' mass — O(total bigrams)
    # overall. The original "sum p_uni over vocab not in seen" form
    # was O(contexts x vocab): quadratic in vocabulary, and on an
    # amplified 200k-token corpus it pinned the driver for hours.
    total_uni = p_uni(UNK) + sum(p_uni(w) for w in vocab)

    bo: dict[str, float] = {}
    for a, bs in succ.items():
        # leftover mass from INTEGER counts — exact and >= 0 by
        # construction: the full distribution sums to (na+V)/(na+V),
        # the RETAINED successors carry sum (c(a,b)+1), so leftover =
        # (na + V - sum_retained (c+1)) / (na + V). With no pruning
        # this reduces to the old (V - S)/(na + V); with pruning the
        # dropped bigrams' mass lands here, which is exactly Katz
        # estimate-then-prune. A float sum of the quantized seen probs
        # can dip below 0 when S = V, hence the integer form.
        retained = len(bs) + sum(nab[(a, b)] for b in bs)
        leftover = (na[a] + V - retained) / (na[a] + V)
        unseen_uni = total_uni - sum(p_uni(w) for w in bs)
        # guard float cancellation when seen mass ~ total (S ~ V):
        # leftover is exactly 0 there anyway, so the weight is 0
        bo[a] = leftover / unseen_uni if unseen_uni > 1e-15 else 0.0

    def lg(x: float) -> str:
        # SRILM/KenLM convention: log10(0) is written as -99 (a
        # context followed by EVERY vocab token has zero backoff mass)
        return "-99" if x <= 0.0 else f"{math.log10(x):.7f}"

    lines = ["\\data\\"]
    lines.append(f"ngram 1={V + 1}")  # vocab + <unk>
    lines.append(f"ngram 2={len(nab)}")
    lines.append("")
    lines.append("\\1-grams:")
    # <unk> first (KenLM convention), then lexicographic vocab; a
    # token with successors carries its log10 backoff weight
    lines.append(f"{lg(p_uni(UNK))}\t{UNK}")
    for w in vocab:
        if w in bo:
            lines.append(f"{lg(p_uni(w))}\t{w}\t{lg(bo[w])}")
        else:
            lines.append(f"{lg(p_uni(w))}\t{w}")
    lines.append("")
    lines.append("\\2-grams:")
    for a, b in sorted(nab):
        lines.append(f"{lg(p_bi(a, b))}\t{a} {b}")
    lines.append("")
    lines.append("\\end\\")

    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")
    return path


def read_arpa(path: str):
    """Parse an ARPA file back into
    ``(unigrams, backoffs, bigrams)``: ``unigrams[w]`` / ``bigrams[(a,
    b)]`` are PROBABILITIES (10**logprob), ``backoffs[a]`` the linear
    backoff weight. Supports the bigram subset this module writes —
    enough for round-trip tests and for scoring with
    ``score_bigram``."""
    unigrams: dict[str, float] = {}
    backoffs: dict[str, float] = {}
    bigrams: dict[tuple[str, str], float] = {}
    section = None
    with open(path, encoding="utf-8") as fh:
        for raw in fh:
            line = raw.rstrip("\n")
            if not line or line.startswith("\\data\\") or line.startswith("ngram "):
                continue
            if line == "\\1-grams:":
                section = 1
                continue
            if line == "\\2-grams:":
                section = 2
                continue
            if line == "\\end\\":
                break
            parts = line.split("\t")
            if section == 1:
                lp, w = parts[0], parts[1]
                unigrams[w] = 10.0 ** float(lp)
                if len(parts) == 3:
                    blp = float(parts[2])
                    # -99 is the SRILM/KenLM sentinel for log10(0)
                    backoffs[w] = 0.0 if blp <= -98.0 else 10.0 ** blp
            elif section == 2:
                lp, ab = parts[0], parts[1]
                a, b = ab.split(" ")
                bigrams[(a, b)] = 10.0 ** float(lp)
    return unigrams, backoffs, bigrams


def score_bigram(
    model, a: str, b: str
) -> float:
    """p(b|a) under a parsed ARPA model: the explicit bigram if
    present, else backoff(a) * p_uni(b) (with ``<unk>`` for an
    out-of-vocabulary b; a context with no successors — or OOV —
    backs off with weight 1, the ARPA default)."""
    unigrams, backoffs, bigrams = model
    if (a, b) in bigrams:
        return bigrams[(a, b)]
    pu = unigrams.get(b, unigrams[UNK])
    return backoffs.get(a, 1.0) * pu


def score_docs_with_arpa(
    docs: DataFrame, path: str, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Score documents against an ARPA bigram model — the IMPORT half
    of the KenLM loop: a gate trained on one corpus snapshot (or by a
    foreign toolchain) scores the next snapshot without retraining.

    Per document: bits = mean over its token bigrams of
    -log2 p(b|a), where p comes from the parsed model — the explicit
    bigram entry when present, else backoff(a) * p_uni(b), with
    out-of-vocabulary tokens mapped to ``<unk>`` (open-vocabulary, so
    every bigram scores; a zero-backoff context contributes the
    model's "impossible" mass and the document floats to the reject
    tail, which is the desired gate behavior — represented here by
    p = p_uni(<unk>) * 1e-99 rather than a literal 0 so log2 stays
    finite). Documents with < 2 tokens carry no bigram and are absent,
    matching q_ngram_lm_score.

    Scale shape: the model is parsed DRIVER-side (model-sized file —
    it was the artifact) into three small DataFrames joined to the
    per-doc DISTINCT bigrams; the joins are AQE-sized like the
    self-trained gate (a pruned/top-V model broadcasts, a full
    web-corpus model shuffles on its key). The corpus-side work is
    identical to q_ngram_lm_score: map-side bigram build, one
    distinct-bigram aggregate, one per-doc aggregate.
    """
    spark = docs.sparkSession
    unigrams, backoffs, bigrams = read_arpa(path)

    uni_df = spark.createDataFrame(
        [(w, p) for w, p in unigrams.items()], "tb string, p_uni double"
    )
    bo_df = spark.createDataFrame(
        [(w, b) for w, b in backoffs.items()], "ta string, bo double"
    )
    bi_df = spark.createDataFrame(
        [(a, b, p) for (a, b), p in bigrams.items()],
        "ta string, tb string, p_bi double",
    )

    ts = F.split(F.col(text_col), " ")
    bigrams_col = F.when(
        F.size(ts) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ts) - 1),
            lambda i: F.struct(
                F.element_at(ts, i).alias("ta"),
                F.element_at(ts, i + 1).alias("tb"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<ta:string,tb:string>>"))
    bg = docs.select(id_col, F.explode(bigrams_col).alias("b")).select(
        id_col, F.col("b.ta").alias("ta"), F.col("b.tb").alias("tb")
    )
    bgc = bg.groupBy(id_col, "ta", "tb").agg(F.count(F.lit(1)).alias("m"))

    p_unk = unigrams[UNK]
    scored = (
        bgc.join(bi_df, ["ta", "tb"], "left")
        .join(bo_df, "ta", "left")
        .join(uni_df, "tb", "left")
        .withColumn(
            "p",
            F.coalesce(
                F.col("p_bi"),
                # backoff: bo(a) * p_uni(b); OOV context -> bo = 1,
                # OOV b -> p_uni(<unk>); zero-backoff floored so the
                # log stays finite (documents land in the reject tail)
                F.greatest(
                    F.coalesce(F.col("bo"), F.lit(1.0))
                    * F.coalesce(F.col("p_uni"), F.lit(p_unk)),
                    F.lit(1e-99),
                ),
            ),
        )
        .withColumn("bits", -F.log2(F.col("p")))
    )
    return scored.groupBy(id_col).agg(
        F.sum("m").alias("n_bigrams"),
        F.round(F.sum(F.col("m") * F.col("bits")) / F.sum("m"), 3).alias(
            "bits_per_token"
        ),
    )
