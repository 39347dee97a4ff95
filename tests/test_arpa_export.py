"""ARPA (KenLM-format) export of the token-bigram LM
(operators/lm.py): the invariants that make the file a probability
model — per-context normalization to exactly 1 via the Katz backoff
weights, open-vocabulary <unk>, formula parity with the
q_ngram_lm_score gate — plus byte determinism and round-trip parse.
"""

import math

import pytest
from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.operators.lm import (
    UNK,
    export_arpa_bigram,
    read_arpa,
    score_bigram,
)
from arc_kinesis_tagging_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def tiny_model(spark, tmp_path_factory):
    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "the cat ran"),
            (2, "a dog sat"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path_factory.mktemp("arpa") / "bigram.arpa")
    export_arpa_bigram(docs, path)
    return docs, path


def test_arpa_structure_and_counts(tiny_model):
    """Header counts match the body: ngram 1 = vocab + <unk>, ngram 2
    = distinct observed bigrams; sections present and ordered."""
    _docs, path = tiny_model
    text = open(path).read()
    assert text.startswith("\\data\\\n")
    assert "\\1-grams:" in text and "\\2-grams:" in text
    assert text.rstrip().endswith("\\end\\")
    uni, bo, bi = read_arpa(path)
    header = dict(
        line.split("=")
        for line in text.splitlines()
        if line.startswith("ngram ")
    )
    assert int(header["ngram 1"]) == len(uni)
    assert int(header["ngram 2"]) == len(bi)
    assert UNK in uni


def test_every_context_distribution_sums_to_one(tiny_model):
    """THE backoff-model invariant: for every context a with
    successors, sum over the full open vocabulary (seen bigrams
    explicit, unseen via bo(a) * p_uni) equals 1 up to bo's own 7-dp
    log10 quantization. Without the
    Katz-normalized backoff weights this fails — an ARPA file whose
    contexts don't normalize is a score table, not a model."""
    _docs, path = tiny_model
    model = uni, bo, bi = read_arpa(path)
    vocab = [w for w in uni]  # includes <unk>
    contexts = {a for a, _ in bi}
    for a in contexts:
        total = sum(score_bigram(model, a, b) for b in vocab)
        # bo(a) is computed from the quantized probabilities, so the
        # only residual is bo(a)'s own 7-dp log10 quantization
        assert abs(total - 1.0) < 1e-6, (a, total)


def test_unigrams_sum_to_one(tiny_model):
    _docs, path = tiny_model
    uni, _bo, _bi = read_arpa(path)
    assert abs(sum(uni.values()) - 1.0) < 1e-6  # 7-dp log10 quantization


def test_bigram_probs_match_gate_formula(tiny_model):
    """Exported p(b|a) == (c(a,b)+1)/(c(a.)+V) — the exact add-one
    distribution q_ngram_lm_score's bits_per_token is computed from,
    so a gate trained at export time scores identically at query
    time."""
    docs, path = tiny_model
    _uni, _bo, bi = read_arpa(path)
    toks = [t for (d,) in docs.select("text").collect() for t in d.split(" ")]
    V = len(set(toks))
    from collections import Counter

    pairs = Counter()
    ctx = Counter()
    for (d,) in docs.select("text").collect():
        ws = d.split(" ")
        for a, b in zip(ws, ws[1:]):
            pairs[(a, b)] += 1
            ctx[a] += 1
    assert set(bi) == set(pairs)
    for (a, b), c in pairs.items():
        want = (c + 1) / (ctx[a] + V)
        assert abs(bi[(a, b)] - want) < 1e-6, (a, b)


def test_oov_and_backoff_scoring(tiny_model):
    """score_bigram falls back: unseen (a,b) uses bo(a)*p_uni(b); OOV
    b maps to <unk>; a context with no successors backs off with
    weight 1. All probabilities in (0, 1)."""
    _docs, path = tiny_model
    model = uni, bo, bi = read_arpa(path)
    p_unseen = score_bigram(model, "cat", "dog")  # both in vocab, pair unseen
    assert 0 < p_unseen < 1
    assert ("cat", "dog") not in bi
    p_oov = score_bigram(model, "cat", "zzz-never-seen")
    assert abs(p_oov - bo["cat"] * uni[UNK]) < 1e-12
    p_octx = score_bigram(model, "zzz-never-seen", "cat")
    assert abs(p_octx - uni["cat"]) < 1e-12


def test_export_is_byte_deterministic(spark, tmp_path):
    docs = spark.createDataFrame(
        [(0, "b a b a c"), (1, "a b c a")], "doc_id long, text string"
    )
    p1 = str(tmp_path / "a.arpa")
    p2 = str(tmp_path / "b.arpa")
    export_arpa_bigram(docs, p1)
    export_arpa_bigram(docs, p2)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_export_on_documents_table(spark, sf_dir, tmp_path):
    """End-to-end on the real documents table: model exports, parses
    back, every context normalizes, and a seen bigram's -log2 prob
    equals the gate's per-bigram bits (formula parity at table
    scale)."""
    docs = load_table(spark, "documents", sf_dir)
    path = str(tmp_path / "docs.arpa")
    export_arpa_bigram(docs, path)
    model = uni, bo, bi = read_arpa(path)
    assert bi  # corpus has bigrams

    # spot-check normalization on 5 contexts (full check is O(V^2))
    vocab = list(uni)
    for a in sorted({a for a, _ in bi})[:5]:
        total = sum(score_bigram(model, a, b) for b in vocab)
        assert abs(total - 1.0) < 1e-6, (a, total)

    # gate parity: recompute one seen bigram's bits from raw counts
    ts = F.split(F.col("text"), " ")
    toks = docs.select(F.explode(ts).alias("t"))
    V = toks.agg(F.countDistinct("t")).collect()[0][0]
    (a, b), p = next(iter(sorted(bi.items())))
    bits_model = -math.log2(p)
    bg = docs.select(
        F.explode(
            F.when(
                F.size(ts) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(ts) - 1),
                    lambda i: F.struct(
                        F.element_at(ts, i).alias("ta"),
                        F.element_at(ts, i + 1).alias("tb"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<ta:string,tb:string>>"))
        ).alias("b")
    ).select("b.ta", "b.tb")
    nab = bg.filter((F.col("ta") == a) & (F.col("tb") == b)).count()
    na = bg.filter(F.col("ta") == a).count()
    bits_gate = -math.log2((nab + 1) / (na + V))
    assert abs(bits_model - bits_gate) < 1e-5


def test_score_docs_with_arpa_matches_gate_on_training_corpus(
    spark, sf_dir, tmp_path
):
    """The import loop closes: export the model from the documents
    table, score the SAME table through score_docs_with_arpa, and the
    result must match q_ngram_lm_score row for row — every scored
    bigram was seen in training, so the ARPA path's probabilities are
    the gate's add-one formula (up to 7-dp log10 quantization, far
    below the 3-dp rounding both sides apply)."""
    from arc_kinesis_tagging_spark.operators.lm import score_docs_with_arpa
    from arc_kinesis_tagging_spark.plans.quality_ops import q_ngram_lm_score

    docs = load_table(spark, "documents", sf_dir)
    path = str(tmp_path / "gate.arpa")
    export_arpa_bigram(docs, path)

    got = {
        r["doc_id"]: (r["n_bigrams"], r["bits_per_token"])
        for r in score_docs_with_arpa(docs, path).collect()
    }
    want = {
        r["doc_id"]: (r["n_bigrams"], r["bits_per_token"])
        for r in q_ngram_lm_score(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for did in want:
        assert got[did][0] == want[did][0], did  # n_bigrams
        assert abs(got[did][1] - want[did][1]) <= 0.001, (
            did,
            got[did],
            want[did],
        )


def test_score_docs_with_arpa_oov_and_unseen(spark, tmp_path):
    """A foreign corpus scores through the model's backoff path: OOV
    tokens map to <unk>, unseen-but-in-vocab bigrams use
    bo(a) * p_uni(b), and every document with >= 2 tokens gets a
    finite score."""
    import math as _math

    from arc_kinesis_tagging_spark.operators.lm import (
        score_bigram,
        score_docs_with_arpa,
    )

    train = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "the cat ran")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "t.arpa")
    export_arpa_bigram(train, path)
    model = read_arpa(path)

    test_docs = spark.createDataFrame(
        [(10, "cat the"), (11, "wholly novel tokens")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in score_docs_with_arpa(test_docs, path).collect()}
    assert set(rows) == {10, 11}
    for r in rows.values():
        assert r["bits_per_token"] == r["bits_per_token"]  # not NaN
        assert r["bits_per_token"] > 0

    # doc 10: single unseen-in-vocab bigram (cat, the) -> exact backoff
    want10 = round(-_math.log2(score_bigram(model, "cat", "the")), 3)
    assert abs(rows[10]["bits_per_token"] - want10) <= 0.001
    # doc 11: all-OOV bigrams -> p = 1 * p_uni(<unk>) each
    uni, _bo, _bi = model
    want11 = round(-_math.log2(uni["<unk>"]), 3)
    assert abs(rows[11]["bits_per_token"] - want11) <= 0.001


def test_pruned_export_keeps_model_normalized(spark, tmp_path):
    """KenLM-style count pruning (prune_count=1): singleton bigrams
    drop from the model, their mass folds into the context backoff
    weight (estimate-then-prune), and every context with RETAINED
    successors still normalizes to 1 over the open vocabulary —
    pruning must redistribute mass, never destroy it."""
    docs = spark.createDataFrame(
        [
            ("the cat sat on the mat",),
            ("the cat sat on the hat",),
            ("a dog ran",),  # every bigram here is a singleton
        ],
        "text string",
    )
    full = str(tmp_path / "full.arpa")
    pruned = str(tmp_path / "pruned.arpa")
    export_arpa_bigram(docs, full)
    export_arpa_bigram(docs, pruned, prune_count=1)

    fu, fbo, fbi = read_arpa(full)
    pu, pbo, pbi = read_arpa(pruned)
    # pruning dropped the singletons ("a dog", "dog ran", "on the"
    # survives: count 2) and kept every count>=2 bigram at the SAME
    # probability (estimate-then-prune)
    assert set(pbi) < set(fbi)
    assert all(fbi[k] == pbi[k] for k in pbi)
    assert ("the", "cat") in pbi and ("a", "dog") not in pbi
    # unigrams unchanged (pruning only touches the bigram table)
    assert fu == pu
    # normalization holds for every retained context
    vocab = list(pu)
    model = (pu, pbo, pbi)
    for a in {a for a, _ in pbi}:
        total = sum(score_bigram(model, a, b) for b in vocab)
        assert abs(total - 1.0) < 1e-6, (a, total)
    # a fully-pruned context backs off through p_uni with implicit
    # weight 1: scoring still works and is a proper distribution up
    # to the quantization of the unigram table itself
    total = sum(score_bigram(model, "dog", b) for b in vocab)
    assert abs(total - 1.0) < 2e-6, total


def test_pruned_model_is_smaller_on_heavy_tail(spark, sf_dir, tmp_path):
    """On a corpus with per-document unique tokens (the scale
    ladder's salt-amplification shape, and real crawls' long tail of
    ids/urls/typos), prune_count=1 must shrink the bigram table by
    the singleton fraction — the bounded-artifact property the scale
    ladder leans on."""
    import pyspark.sql.functions as F

    from arc_kinesis_tagging_spark.sources.tables import load_table

    d = load_table(spark, "documents", sf_dir).select(
        # one unique token per doc -> two singleton bigrams per doc
        F.concat(
            F.col("text"), F.lit(" salt"), F.col("doc_id").cast("string")
        ).alias("text")
    )
    full = str(tmp_path / "f.arpa")
    pruned = str(tmp_path / "p.arpa")
    export_arpa_bigram(d, full)
    export_arpa_bigram(d, pruned, prune_count=1)
    _, _, fbi = read_arpa(full)
    _, _, pbi = read_arpa(pruned)
    assert len(pbi) < len(fbi) * 0.8, (len(pbi), len(fbi))
