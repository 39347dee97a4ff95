"""fastText-style supervised quality classifier: hashed bag-of-n-grams
linear model, trained distributedly, applied map-side.

The one standard LLM-curation stage the engine's quality family still
lacked (round-14 verdict task 5): a SUPERVISED classifier in the mold
of fastText (Joulin et al. 2016, "Bag of Tricks for Efficient Text
Classification" — public), the machinery behind the classic
wiki-vs-CommonCrawl quality filters (GPT-3 / CCNet lineage) and
fastText's own language-ID models. The unsupervised siblings
(entropy, bigram-LM perplexity, DSIR importance) gate on corpus
statistics; this one learns from LABELS.

Model: multinomial logistic regression over hashed n-gram features.

- features: word unigrams + adjacent bigrams (exactly the DSIR
  feature map, ``plans/quality_ops.py:_dsir_grams``), hashed with the
  portable md5-backed ``stable_hash64`` into ``n_buckets`` buckets —
  cross-engine reproducible, unlike fastText's FNV.
- doc representation x_d: bucket counts normalized by the doc's total
  gram count (fastText's mean-of-embeddings normalization, collapsed
  onto the linear case).
- score_c(d) = bias_c + sum_b x_db * W[b, c]; p = softmax(scores);
  loss = -log p_y (cross-entropy).
- training: full-batch gradient descent, ``epochs`` rounds at rate
  ``lr``. fastText itself runs asynchronous SGD — a sequential,
  nondeterministic algorithm; full-batch GD is the distributed,
  deterministic re-expression (the gradient is one aggregate over the
  corpus), the same train-as-aggregate discipline as the LM/DSIR
  model builds.

Scale shape (the 100 TB question):

- The corpus is featurized ONCE into (doc, bucket, x) rows and
  pinned; every epoch reuses the pin.
- The model is VOCABULARY-BOUNDED: n_buckets * n_classes weights
  (2^18 * C in production, a few MB) — it lives on the driver
  between epochs and rides to executors as a broadcast join, the
  documented bounded-collect discipline of every model table here
  (the corpus is never collected; the model necessarily is — it IS
  the artifact).
- Per epoch: one broadcast join (weights onto features), one
  doc-keyed aggregate (partial-agg collapses to one row per doc
  per partition before the shuffle), one co-partitioned join back,
  and one bucket-keyed aggregate bounded by n_buckets * n_classes.
  Nothing corpus-squared, no corpus-sized window, no Python in the
  loop — every expression is built-in-function codegen.
- Apply is one broadcast join + one doc-keyed aggregate — the
  shuffle carries one row per doc (map-side partial aggregation
  collapses each doc's grams first, since explode preserves row
  locality).

Determinism: weights are rounded before use (default 6 dp — far
above float addition-order drift, the house LM-gate convention) and
predictions argmax over ROUNDED scores with a fixed class-order
tiebreak, so the predicted labels are engine- and
partitioning-deterministic.

Reference parity note: the reference system (a Kinesis tagging
consumer) has no classifier; this extends the engine's curation
surface per the build brief's training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.functions.text import stable_hash64, tokens

#: hash-salt namespace for classifier features (keeps the feature
#: space independent of the DSIR buckets even at equal n_buckets)
CLF_SALT = "qclf:"

#: bucket id used for the bias row in the flattened weights table
BIAS_BUCKET = -1

#: above this bucket count the model no longer rides as constant-folded
#: literal arrays (a 2^18-bucket model would build a multi-hundred-
#: thousand-node expression tree per class — driver/codegen blowup);
#: train/apply fall back to the createDataFrame + broadcast-join shape,
#: which the pre-round-14 code used at every size (round-14 advice)
LITERAL_WEIGHTS_MAX_BUCKETS = 4096


def _weight_cols(spark, W, bias, n_buckets: int, feats: DataFrame,
                 C: int) -> tuple[DataFrame, list]:
    """Attach per-class weight columns ``__w0..__w{C-1}`` to a feature
    frame, choosing the scale-appropriate vehicle: constant-folded
    literal arrays indexed by bucket below LITERAL_WEIGHTS_MAX_BUCKETS
    (zero joins), a broadcast weights-table join above it (bounded
    expression tree). The products x * W[b,c] are the same doubles
    either way. Returns (feats_with_weights, [col __w0, ...])."""
    if n_buckets <= LITERAL_WEIGHTS_MAX_BUCKETS:
        wlit = [
            F.array(*[F.lit(float(W[b][c])) for b in range(n_buckets)])
            for c in range(C)
        ]
        cols = [
            F.element_at(wlit[c], F.col("b").cast("int") + 1)
            for c in range(C)
        ]
        return feats, cols
    rows = [
        (b, *[float(W[b][c]) for c in range(C)]) for b in range(n_buckets)
    ]
    schema = "b long, " + ", ".join(f"__w{c} double" for c in range(C))
    wdf = F.broadcast(spark.createDataFrame(rows, schema))
    return feats.join(wdf, "b"), [F.col(f"__w{c}") for c in range(C)]


def clf_grams(df: DataFrame, text_col: str, id_col: str,
              extra_cols: tuple = ()) -> DataFrame:
    """(id, *extra, g) rows: word unigrams + adjacent bigrams over
    whitespace tokens — one map-side explode, no UDF (the DSIR
    feature map). Docs with no tokens yield no rows (the empty-doc
    gate runs upstream, R16-style)."""
    toks = tokens(F.col(text_col))
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col), *[F.col(c) for c in extra_cols],
        F.explode(F.concat(toks, bigrams)).alias("g"),
    )


def hashed_gram_bucket_counts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
    salt: str = CLF_SALT,
    extra_cols: tuple = (),
) -> DataFrame:
    """(id, *extra, b, m, n_grams) rows: per-document counts of the
    salted hashed unigram+bigram feature buckets — computed entirely
    MAP-SIDE, zero shuffle (round-14 optimization).

    Each document's bucket counts are a per-row fact, so they are
    built per Arrow batch in native code (the same batch-to-native
    shape as operators/dedup.py:_hashed_shingle_rows): tokenizer is
    the Java-regex ``\\s+`` split spelled as its exact ASCII class,
    grams are unigrams + adjacent space-joined bigrams, the bucket is
    ``int(md5(salt + g).hexdigest()[:15], 16) % n_buckets`` — count-
    identical to the explode + (doc, bucket) aggregate + doc-sum
    join-back it replaces, whose TWO corpus shuffles and join this
    removes (and whose interpreted per-gram md5 expressions were the
    measured cost). Shared by the classifier (salt ``qclf:``) and the
    DSIR scorer (salt ``dsir:``); row-multiset equality with the
    expression form is pinned in tests/test_quality_clf.py."""
    id_type = df.schema[id_col].dataType.simpleString()
    extra_types = {
        c: df.schema[c].dataType.simpleString() for c in extra_cols
    }
    schema = ", ".join(
        [f"{id_col} {id_type}"]
        + [f"{c} {extra_types[c]}" for c in extra_cols]
        + ["b long", "m long", "n_grams long"]
    )
    cols = [id_col, *extra_cols]

    def batches(it):
        import hashlib
        import re

        import pandas as pd

        ws = re.compile(r"[ \t\n\x0b\f\r]+")  # Java \s, exactly
        md5 = hashlib.md5
        for pdf in it:
            out: dict = {c: [] for c in cols}
            bs: list = []
            ms: list = []
            ns: list = []
            for vals in zip(*(pdf[c] for c in [*cols, text_col])):
                text = vals[-1]
                toks = [t for t in ws.split(text or "") if t]
                if not toks:
                    continue
                grams = toks + [
                    f"{a} {b}" for a, b in zip(toks, toks[1:])
                ]
                cnt: dict = {}
                for g in grams:
                    b = int(
                        md5((salt + g).encode()).hexdigest()[:15], 16
                    ) % n_buckets
                    cnt[b] = cnt.get(b, 0) + 1
                n = len(grams)
                for b, m in cnt.items():
                    for c, v in zip(cols, vals):
                        out[c].append(v)
                    bs.append(b)
                    ms.append(m)
                    ns.append(n)
            yield pd.DataFrame(
                {
                    **out,
                    "b": pd.Series(bs, dtype="int64"),
                    "m": pd.Series(ms, dtype="int64"),
                    "n_grams": pd.Series(ns, dtype="int64"),
                }
            )

    from arc_kinesis_tagging_spark.operators.skew import spread_small_scan

    return spread_small_scan(df.select(*cols, text_col)).mapInPandas(
        batches, schema
    )


def clf_features_arrays(df: DataFrame, text_col: str, id_col: str,
                        n_buckets: int,
                        extra_cols: tuple = ()) -> DataFrame:
    """(id, *extra, bs array<long>, xs array<double>) — ONE row per
    document: the same per-doc bucket/weight pairs ``clf_features``
    emits as rows, packed into arrays in the identical emission order
    (first occurrence of each bucket in the doc's gram stream), with
    ``xs[i] = m_i / n_grams`` the identical IEEE division. Map-side,
    zero shuffle. The array form lets a consumer compute per-doc
    scores WITHOUT the doc-keyed aggregate the row form needs — the
    round-15 trainer's epoch shape (one shuffle per epoch instead of
    three). Pair-multiset equality with clf_features is pinned in
    tests/test_quality_clf.py. Docs with no tokens yield no row (the
    row-form twin's contract)."""
    id_type = df.schema[id_col].dataType.simpleString()
    extra_types = {
        c: df.schema[c].dataType.simpleString() for c in extra_cols
    }
    schema = ", ".join(
        [f"{id_col} {id_type}"]
        + [f"{c} {extra_types[c]}" for c in extra_cols]
        + ["bs array<long>", "xs array<double>"]
    )
    cols = [id_col, *extra_cols]
    salt = CLF_SALT

    def batches(it):
        import hashlib
        import re

        import pandas as pd

        ws = re.compile(r"[ \t\n\x0b\f\r]+")  # Java \s, exactly
        md5 = hashlib.md5
        for pdf in it:
            out: dict = {c: [] for c in cols}
            bss: list = []
            xss: list = []
            for vals in zip(*(pdf[c] for c in [*cols, text_col])):
                text = vals[-1]
                toks = [t for t in ws.split(text or "") if t]
                if not toks:
                    continue
                grams = toks + [
                    f"{a} {b}" for a, b in zip(toks, toks[1:])
                ]
                cnt: dict = {}
                for g in grams:
                    b = int(
                        md5((salt + g).encode()).hexdigest()[:15], 16
                    ) % n_buckets
                    cnt[b] = cnt.get(b, 0) + 1
                n = len(grams)
                for c, v in zip(cols, vals):
                    out[c].append(v)
                bss.append(list(cnt.keys()))
                xss.append([m / n for m in cnt.values()])
            yield pd.DataFrame({**out, "bs": bss, "xs": xss})

    from arc_kinesis_tagging_spark.operators.skew import spread_small_scan

    return spread_small_scan(df.select(*cols, text_col)).mapInPandas(
        batches, schema
    )


def clf_features(df: DataFrame, text_col: str, id_col: str,
                 n_buckets: int, extra_cols: tuple = ()) -> DataFrame:
    """(id, *extra, b, n_grams, x) rows: hashed-bucket counts
    normalized by the doc's total gram count (``x = m / n_grams`` —
    the same IEEE double division the former aggregate computed).
    Thin projection over hashed_gram_bucket_counts: zero shuffle."""
    return hashed_gram_bucket_counts(
        df, text_col, id_col, n_buckets, salt=CLF_SALT,
        extra_cols=extra_cols,
    ).select(
        id_col, *extra_cols, "b", "n_grams",
        (F.col("m").cast("double") / F.col("n_grams")).alias("x"),
    )


def train_quality_classifier(
    df: DataFrame,
    text_col: str,
    label_col: str,
    id_col: str = "doc_id",
    n_buckets: int = 256,
    epochs: int = 5,
    lr: float = 0.5,
    round_dp: int = 6,
) -> dict:
    """Distributed full-batch GD training. Returns the model as a
    plain dict: {"classes": [...], "W": [[w_bc]], "bias": [...],
    "n_buckets": B} with weights rounded at ``round_dp``.

    The driver holds only MODEL-sized state (B x C floats — the
    vocabulary-bounded collect discipline; see module docstring).
    The class list is collected once (bounded by label cardinality)
    and sorted so class indices are deterministic.

    Epoch shape (round-15): below LITERAL_WEIGHTS_MAX_BUCKETS the
    features are pinned as per-doc ARRAYS and each epoch is ONE
    map-side pass (scores + softmax errors as sequential folds over
    the doc's bucket array with constant-folded literal weights) into
    ONE bucket-keyed aggregate bounded by (B+1) x C — a single
    shuffle per epoch where the row form needs a doc-keyed aggregate,
    a join back, and the bucket aggregate (three exchanges). The
    gradient terms are the same x_db * e_dc multiset; only the
    association order of the per-doc score sums changes (the row
    form's hash-aggregate order was already partitioning-dependent),
    which the round_dp rounding absorbs — equality of the returned
    model with the row form is pinned in tests/test_quality_clf.py.
    Above the literal-weight bound the row form with its broadcast
    weights-table join remains (_train_rowform, the round-14 shape).
    """
    classes = sorted(
        r[0] for r in
        df.select(label_col).where(F.col(label_col).isNotNull())
        .distinct().collect()
    )
    C = len(classes)
    if C < 2:
        raise ValueError(f"need >=2 classes, got {classes}")
    if n_buckets <= LITERAL_WEIGHTS_MAX_BUCKETS:
        return _train_arrayform(
            df, text_col, label_col, id_col, n_buckets, epochs, lr,
            round_dp, classes,
        )
    return _train_rowform(
        df, text_col, label_col, id_col, n_buckets, epochs, lr,
        round_dp, classes,
    )


def _softmax_errs(s_cols: list, label_col: str, classes: list) -> list:
    """Per-class softmax-error expressions e_c = p_c - 1[y = c] over
    score columns, numerically stabilized — shared by both trainer
    forms (identical expression trees)."""
    C = len(classes)
    m = F.greatest(*s_cols) if C > 1 else s_cols[0]
    exps = [F.exp(s_cols[c] - m) for c in range(C)]
    z = exps[0]
    for e in exps[1:]:
        z = z + e
    return [
        exps[c] / z
        - (F.col(label_col) == F.lit(classes[c])).cast("double")
        for c in range(C)
    ]


def _train_arrayform(
    df, text_col, label_col, id_col, n_buckets, epochs, lr,
    round_dp, classes,
) -> dict:
    """Zero-shuffle-per-epoch GD over array-packed features (see
    train_quality_classifier docstring): each epoch is ONE map-only
    Arrow pass — a vectorized numpy kernel computes scores, softmax
    errors, and the per-task partial gradient matrix, and each task
    emits one (B+1) x C partial; the driver sums the ~numPartitions
    partials (model-bounded collect, deterministic partition order).
    The guide-§4.2 shape: Spark distributes the pinned features, the
    per-element math runs in numpy — an expression-tree epoch (either
    the row form's codegen'd aggregates or array folds, both tried)
    loses to this by the per-element evaluation overhead."""
    import numpy as np

    C = len(classes)
    ci = {c: i for i, c in enumerate(classes)}
    feats = clf_features_arrays(
        df, text_col, id_col, n_buckets, extra_cols=(label_col,)
    ).select(label_col, "bs", "xs").localCheckpoint(eager=True)
    n_docs = feats.count()
    W = np.zeros((n_buckets, C))
    bias = np.zeros(C)
    for _ in range(epochs):
        Wc, bc = W.copy(), bias.copy()  # ship per-epoch constants

        def partial_grads(it, Wc=Wc, bc=bc):
            import numpy as _np
            import pandas as _pd

            G = _np.zeros((n_buckets + 1, C))  # last row = bias grad
            for pdf in it:
                if not len(pdf):
                    continue
                lens = _np.fromiter(
                    (len(b) for b in pdf["bs"]), dtype=_np.int64,
                    count=len(pdf),
                )
                allb = _np.concatenate(list(pdf["bs"])).astype(_np.int64)
                allx = _np.concatenate(list(pdf["xs"]))
                di = _np.repeat(_np.arange(len(pdf)), lens)
                # scores s_dc = sum_b x_db W[b, c] + bias_c
                S = _np.zeros((len(pdf), C))
                _np.add.at(S, di, allx[:, None] * Wc[allb])
                S += bc
                # stabilized softmax errors e_dc = p_dc - 1[y_d = c]
                S -= S.max(axis=1, keepdims=True)
                E = _np.exp(S)
                E /= E.sum(axis=1, keepdims=True)
                ys = _np.fromiter(
                    (ci.get(y, -1) for y in pdf[label_col]),
                    dtype=_np.int64, count=len(pdf),
                )
                hit = ys >= 0
                E[_np.nonzero(hit)[0], ys[hit]] -= 1.0
                # partial gradient: g_bc += x_db * e_dc, bias row
                # collects e_dc (the row form's b=-1 pseudo-bucket)
                _np.add.at(G, allb, allx[:, None] * E[di])
                G[n_buckets] += E.sum(axis=0)
            yield _pd.DataFrame({"g": [G.ravel().tolist()]})

        parts = feats.mapInPandas(
            partial_grads, "g array<double>"
        ).collect()
        G = np.zeros((n_buckets + 1, C))
        for r in parts:  # deterministic partition order
            G += np.asarray(r["g"]).reshape(n_buckets + 1, C)
        W -= (lr / n_docs) * G[:n_buckets]
        bias -= (lr / n_docs) * G[n_buckets]
    return {
        "classes": classes,
        "W": np.round(W, round_dp).tolist(),
        "bias": np.round(bias, round_dp).tolist(),
        "n_buckets": n_buckets,
    }


def _train_rowform(
    df, text_col, label_col, id_col, n_buckets, epochs, lr,
    round_dp, classes,
) -> dict:
    """Row-form GD loop (the round-14 shape) — the path for bucket
    counts above the literal-weight bound, where weights ride as a
    broadcast table join keyed on the exploded bucket rows."""
    import numpy as np

    spark = df.sparkSession
    C = len(classes)
    feats = clf_features(
        df, text_col, id_col, n_buckets, extra_cols=(label_col,)
    ).localCheckpoint(eager=True)  # reused by every epoch
    ids = feats.select(id_col).distinct().localCheckpoint(eager=True)
    n_docs = ids.count()
    # Gradient frame: the features PLUS one synthetic (id, b=-1, x=1)
    # row per doc, so the per-epoch bucket aggregate's b=-1 row IS the
    # bias gradient (sum of 1.0 * e_c over docs) — ONE job and ONE
    # collect per epoch where the previous shape ran two actions that
    # each recomputed the un-pinned error subtree (round-14
    # optimization; the gradient sums are over the same row multisets
    # as before).
    feats_grad = feats.select(id_col, "b", "x").unionByName(
        ids.select(
            F.col(id_col),
            F.lit(BIAS_BUCKET).cast("long").alias("b"),
            F.lit(1.0).alias("x"),
        )
    ).localCheckpoint(eager=True)
    W = np.zeros((n_buckets, C))
    bias = np.zeros(C)
    for _ in range(epochs):
        # weights ride as CONSTANT-FOLDED literal arrays indexed by
        # bucket — no per-epoch createDataFrame/broadcast join (the
        # products x * W[b,c] are the same doubles either way); above
        # LITERAL_WEIGHTS_MAX_BUCKETS _weight_cols falls back to the
        # broadcast-join shape (round-14 advice: a 2^18-bucket literal
        # tree is a codegen blowup)
        fw, wcols = _weight_cols(spark, W, bias, n_buckets, feats, C)
        s = fw.groupBy(id_col, label_col).agg(*[
            (
                F.sum(F.col("x") * wcols[c]) + F.lit(float(bias[c]))
            ).alias(f"s{c}")
            for c in range(C)
        ])
        # softmax errors e_c = p_c - 1[y = c], numerically stabilized
        m = F.greatest(*[F.col(f"s{c}") for c in range(C)])
        exps = [F.exp(F.col(f"s{c}") - m) for c in range(C)]
        z = exps[0]
        for e in exps[1:]:
            z = z + e
        err = s.select(
            id_col,
            *[
                (exps[c] / z
                 - (F.col(label_col) == F.lit(classes[c])).cast("double")
                 ).alias(f"e{c}")
                for c in range(C)
            ],
        )
        # gradient: join back onto the pinned gradient frame, then a
        # bucket-keyed aggregate bounded by (B + 1) x C — the b=-1 row
        # carries the bias gradient
        grad_rows = (
            feats_grad.join(err, id_col)
            .groupBy("b")
            .agg(*[
                F.sum(F.col("x") * F.col(f"e{c}")).alias(f"g{c}")
                for c in range(C)
            ])
            .collect()
        )
        G = np.zeros_like(W)
        gb = np.zeros(C)
        for r in grad_rows:
            if r["b"] == BIAS_BUCKET:
                gb = np.array([r[f"g{c}"] for c in range(C)])
            else:
                G[r["b"]] = [r[f"g{c}"] for c in range(C)]
        W -= (lr / n_docs) * G
        bias -= (lr / n_docs) * gb
    return {
        "classes": classes,
        "W": np.round(W, round_dp).tolist(),
        "bias": np.round(bias, round_dp).tolist(),
        "n_buckets": n_buckets,
    }


def weights_table(spark, model: dict) -> DataFrame:
    """Flatten a trained model into (b, label, w) rows — the
    persistable artifact (bias rows carry b = BIAS_BUCKET). Row count
    is (n_buckets + 1) * n_classes, model-bounded."""
    rows = [
        (int(b), model["classes"][c], float(w))
        for b, ws in enumerate(model["W"])
        for c, w in enumerate(ws)
    ] + [
        (BIAS_BUCKET, model["classes"][c], float(bv))
        for c, bv in enumerate(model["bias"])
    ]
    return spark.createDataFrame(rows, "b int, label string, w double")


def model_from_weights_table(wdf: DataFrame) -> dict:
    """Inverse of weights_table: rebuild the model dict from the
    persisted (b, label, w) artifact (e.g. a parquet written by a
    training job — the deployment path tools/curation_e2e.py uses).
    The collect is model-bounded by construction: the table IS the
    artifact."""
    rows = wdf.collect()
    classes = sorted({r["label"] for r in rows})
    ci = {c: i for i, c in enumerate(classes)}
    n_buckets = max(r["b"] for r in rows) + 1
    W = [[0.0] * len(classes) for _ in range(n_buckets)]
    bias = [0.0] * len(classes)
    for r in rows:
        if r["b"] == BIAS_BUCKET:
            bias[ci[r["label"]]] = r["w"]
        else:
            W[r["b"]][ci[r["label"]]] = r["w"]
    return {"classes": classes, "W": W, "bias": bias,
            "n_buckets": n_buckets}


def apply_quality_classifier(
    df: DataFrame,
    model: dict,
    text_col: str,
    id_col: str = "doc_id",
    score_dp: int = 4,
    extra_cols: tuple = (),
) -> DataFrame:
    """Score + predict: (id, *extra, n_grams, pred, score) with
    ``pred`` the argmax class over ``score_dp``-rounded scores
    (fixed class-order tiebreak — deterministic across engines and
    partitionings) and ``score`` the rounded winning score.

    ONE doc-keyed aggregate total (round-14 optimization): the
    driver-held model rides as constant-folded literal weight arrays
    indexed by bucket instead of a createDataFrame + broadcast join —
    with the map-side clf_features this makes apply a single-shuffle
    pass at any corpus size (the products x * W[b,c] are the same
    doubles the join produced). Above LITERAL_WEIGHTS_MAX_BUCKETS the
    weights fall back to the broadcast-join vehicle (round-14 advice:
    hashed-feature models at 2^18 buckets must not become
    half-million-node expression trees)."""
    classes = model["classes"]
    C = len(classes)
    feats = clf_features(df, text_col, id_col, model["n_buckets"],
                         extra_cols=extra_cols)
    fw, wcols = _weight_cols(
        df.sparkSession, model["W"], model["bias"], model["n_buckets"],
        feats, C,
    )
    s = fw.groupBy(id_col, *extra_cols).agg(
        F.max("n_grams").alias("n_grams"),
        *[
            (
                F.sum(F.col("x") * wcols[c])
                + F.lit(float(model["bias"][c]))
            ).alias(f"s{c}")
            for c in range(C)
        ],
    )
    r_cols = [F.round(F.col(f"s{c}"), score_dp) for c in range(C)]
    best = F.greatest(*r_cols)
    pred = F.lit(None).cast("string")
    # reversed when-chain => FIRST class in sorted order wins ties
    for c in range(C - 1, -1, -1):
        pred = F.when(r_cols[c] == best, F.lit(classes[c])).otherwise(pred)
    return s.select(
        id_col, *extra_cols, "n_grams",
        pred.alias("pred"), best.alias("score"),
    )
