"""Property-based tests (hypothesis): the Spark expression operators
against simple Python models on randomized inputs.

Each property runs a bounded number of examples (Spark round-trips are
~100ms each); the point is input-shape coverage the handwritten cases
miss — odd tag lists, duplicate timestamps, empty strings.
"""

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.functions.arrays import make_tag, tag_upsert
from arc_kinesis_tagging_spark.operators.joins import asof_join
from arc_kinesis_tagging_spark.streaming.sinks import modify_tags

ARR_T = "array<struct<slug:string,text:string>>"

slug = st.text(alphabet="abcdef-", min_size=0, max_size=8)
tag_st = st.fixed_dictionaries({"slug": slug, "text": slug})
tags_st = st.none() | st.lists(tag_st, max_size=6)

SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


AUTOTAG_DICT = {"slug": "kinesis-autotag", "text": "kinesis autotag"}


@given(tags=tags_st)
@SETTINGS
def test_tag_upsert_matches_python_model(sp, tags):
    """The Catalyst tag_upsert expression == append-if-absent over the
    deduped input (array_union semantics) for arbitrary pre-existing
    tag arrays — including duplicates, empties, and the autotag itself.
    The streaming-sink Python model (modify_tags) must agree on the
    final membership."""
    df = sp.createDataFrame([(tags,)], f"tags {ARR_T}")
    got = df.select(tag_upsert(F.col("tags"), make_tag()).alias("after")).collect()[0]["after"]
    got_tags = [r.asDict() for r in got]

    dedup_in = []
    for t in tags or []:
        if t not in dedup_in:
            dedup_in.append(t)
    model = dedup_in + ([] if AUTOTAG_DICT in dedup_in else [AUTOTAG_DICT])
    assert got_tags == model

    sink_doc = modify_tags(
        {} if tags is None else {"taxonomy": {"tags": list(tags)}}, AUTOTAG_DICT
    )
    assert {tuple(sorted(t.items())) for t in sink_doc["taxonomy"]["tags"]} == {
        tuple(sorted(t.items())) for t in got_tags
    }


@given(
    events=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)), min_size=1, max_size=12
    ),
    orders=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)), min_size=0, max_size=12
    ),
)
@SETTINGS
def test_asof_join_matches_naive_model(sp, events, orders):
    """asof_join == per-event max(order_ts <= event_ts) for arbitrary
    key/timestamp multisets, including duplicate timestamps."""
    base = datetime(2024, 1, 1)
    ev_rows = [
        (i, k, base + timedelta(seconds=s)) for i, (k, s) in enumerate(events)
    ]
    or_rows = [(k, base + timedelta(seconds=s)) for k, s in orders]
    ev = sp.createDataFrame(ev_rows, "event_id long, k long, ts timestamp")
    orr = sp.createDataFrame(or_rows, "k long, ots timestamp") if or_rows else sp.createDataFrame([], "k long, ots timestamp")
    out = asof_join(ev, orr, on=["k"], left_ts="ts", right_ts="ots", right_cols=["ots"])
    got = {r["event_id"]: r["asof_ots"] for r in out.collect()}

    model = {}
    for i, (k, s) in enumerate(events):
        cand = [os for ok, os in orders if ok == k and os <= s]
        model[i] = (base + timedelta(seconds=max(cand))) if cand else None
    assert got == model


# --- chunking / packing properties ------------------------------------------

docs_st = st.lists(
    st.lists(st.sampled_from(["a", "bb", "ccc", "d0"]), min_size=0, max_size=12),
    min_size=1,
    max_size=10,
)


@given(docs=docs_st, chunk_size=st.integers(1, 6), stride=st.integers(1, 6))
@SETTINGS
def test_chunk_documents_model(sp, docs, chunk_size, stride):
    """Chunks == the Python sliding-window model for arbitrary doc
    lengths (including empty), chunk sizes, and strides."""
    from arc_kinesis_tagging_spark.operators.chunking import chunk_documents

    df = sp.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["chunk_tokens"])
        for r in chunk_documents(df, chunk_size=chunk_size, stride=stride).collect()
    }
    want = {}
    for i, toks in enumerate(docs):
        for ci, s in enumerate(range(0, len(toks), stride)):
            part = toks[s : s + chunk_size]
            want[(i, ci)] = (" ".join(part), len(part))
    assert got == want


@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["s0", "s1", "s2"]), st.integers(0, 9)),
        min_size=1,
        max_size=14,
    ),
    capacity=st.integers(1, 8),
)
@SETTINGS
def test_pack_token_spans_model(sp, docs, capacity):
    """Span assignment == the Python concat-and-cut model: per source,
    token count conservation and window capacity both hold for
    arbitrary doc lengths (including empty docs, which vanish)."""
    from arc_kinesis_tagging_spark.operators.chunking import pack_token_spans

    df = sp.createDataFrame(
        [(i, src, " ".join(["t"] * n)) for i, (src, n) in enumerate(docs)],
        "doc_id long, source string, text string",
    )
    got = {
        (r["source"], r["doc_id"], r["window_id"]): r["tokens_in_window"]
        for r in pack_token_spans(df, capacity=capacity).collect()
    }
    want = {}
    offsets: dict = {}
    for i, (src, n) in enumerate(docs):  # doc_id order == list order
        if n == 0:
            continue
        start = offsets.get(src, 0)
        for tok_off in range(start, start + n):
            k = (src, i, tok_off // capacity)
            want[k] = want.get(k, 0) + 1
        offsets[src] = start + n
    assert got == want


# --- round-5: JPEG codec and segment dedup against Python models ------------

px_dims = st.tuples(st.integers(1, 40), st.integers(1, 40))


@given(dims=px_dims, seed=st.integers(0, 2**31 - 1),
       qscale=st.sampled_from([1, 1, 1, 8, 32]))
@settings(max_examples=20, deadline=None)
def test_jpeg_roundtrip_error_bound(dims, seed, qscale):
    """Pure-Python property (no Spark): ANY image shape — including
    non-multiple-of-8 edges that exercise the padding/crop path —
    round-trips within the quantization error bound: +-1 at quant=1
    (float-IDCT rounding only), and mean error well under the quant
    step otherwise."""
    import numpy as np

    from arc_kinesis_tagging_spark.operators.multimodal import (
        decode_jpeg_bytes,
        encode_jpeg_gray,
    )

    h, w = dims
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w)).astype(np.float64)
    dec = decode_jpeg_bytes(encode_jpeg_gray(px, np.full(64, qscale)))
    assert dec.shape == (h, w)
    if qscale == 1:
        assert np.abs(dec - px).max() <= 1.0
    else:
        assert np.abs(dec - px).mean() <= qscale


def _dedup_segments_model(docs, seg_tokens=10):
    """Naive single-machine reference for dedup_segments."""
    segs = {}
    out = {}
    for doc_id, text in sorted(docs):
        toks = [t for t in text.split() if t]
        parts = [" ".join(toks[i:i + seg_tokens])
                 for i in range(0, len(toks), seg_tokens)]
        out[doc_id] = {"n_segs": len(parts), "kept": []}
        for idx, s in enumerate(parts):
            segs.setdefault(s, doc_id)
        for idx, s in enumerate(parts):
            if segs[s] == doc_id:
                out[doc_id]["kept"].append(s)
    return out


word = st.sampled_from(["alpha", "beta", "gamma", "delta", "x"])
doc_text = st.lists(word, min_size=0, max_size=35).map(" ".join)


@given(texts=st.lists(doc_text, min_size=1, max_size=8))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_dedup_segments_matches_python_model(spark, texts):
    from arc_kinesis_tagging_spark.operators.textops import dedup_segments

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup_segments(df, seg_tokens=10).collect()}
    model = _dedup_segments_model(docs)
    assert set(got) == set(model)
    for doc_id, m in model.items():
        assert got[doc_id]["n_segs"] == m["n_segs"], doc_id
        assert got[doc_id]["n_kept"] == len(m["kept"]), doc_id
        assert got[doc_id]["clean_text"] == " ".join(m["kept"]), doc_id


@given(
    hot_n=st.integers(30, 80),
    tail_n=st.integers(0, 60),
    phi=st.sampled_from([0.05, 0.1]),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_heavy_hitters_matches_exact_model(spark, hot_n, tail_n, phi):
    """Random corpora: the Misra-Gries + verify pipeline must equal the
    exact heavy-hitter set computed by a Python counter."""
    from collections import Counter

    from arc_kinesis_tagging_spark.operators.textops import heavy_hitters

    toks = ["hot"] * hot_n + [f"t{i}" for i in range(tail_n)]
    docs = [(i, " ".join(toks[i::7])) for i in range(7)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    counts = Counter(t for _, text in docs for t in text.split())
    total = sum(counts.values())
    expect = {t: c for t, c in counts.items() if c > phi * total}
    got = {r["token"]: r["freq"] for r in heavy_hitters(df, phi=phi).collect()}
    assert got == expect


# --- round-7 primitives -------------------------------------------------


score_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),       # query_id (few groups)
        st.integers(min_value=0, max_value=60),      # vec_id
        st.sampled_from([0.1, 0.25, 0.25, 0.5, 0.9]),  # scores with ties
    ),
    min_size=1,
    max_size=60,
)


@given(rows=score_rows, limit=st.integers(min_value=1, max_value=7),
       nparts=st.integers(min_value=1, max_value=5))
@SETTINGS
def test_bounded_topk_equals_single_window(sp, rows, limit, nparts):
    """The two-level bounded_topk_rank must return EXACTLY the single
    full-window top-k under the (score DESC, id ASC) total order, for
    any grouping, tie structure, duplicate ids, and input partitioning
    — the identity that justified replacing the corpus-sized window."""
    from pyspark.sql import Window

    from arc_kinesis_tagging_spark.operators.similarity import bounded_topk_rank

    # de-dup (query, vec) pairs so the total order is unambiguous
    uniq = {(q, v): s for q, v, s in rows}
    data = [(q, v, s) for (q, v), s in uniq.items()]
    df = sp.createDataFrame(
        data, "query_id int, vec_id int, score double"
    ).repartition(nparts)
    got = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in bounded_topk_rank(df, limit, order_col="score").collect()
    }
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    want = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= limit)
        .collect()
    }
    assert got == want


token_docs = st.lists(
    st.lists(st.sampled_from(list("abcx")), min_size=0, max_size=40)
    .map(lambda ts: " ".join(ts)),
    min_size=1,
    max_size=8,
)


@given(texts=token_docs)
@SETTINGS
def test_rolling_window_hash_is_content_function(sp, texts):
    """The Rabin-Karp window stage: every emitted (doc, s) is a real
    in-bounds window, every doc with >= w tokens emits exactly
    n-w+1 windows, and two windows hash equal IFF their token content
    is equal (over a tiny alphabet that forces massive duplication
    across docs and positions)."""
    from arc_kinesis_tagging_spark.plans.quality_ops import (
        _SUBSTR_W,
        _rolling_windows_np,
    )

    df = sp.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = _rolling_windows_np(df, _SUBSTR_W).collect()
    toks = {i: t.split(" ") for i, t in enumerate(texts)}
    per_doc = {}
    content = {}
    for r in rows:
        ts = toks[r["doc_id"]]
        assert r["n_tokens"] == len(ts)
        s = r["s"]
        assert 1 <= s <= len(ts) - _SUBSTR_W + 1
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
        content[(r["doc_id"], s)] = (
            tuple(ts[s - 1 : s - 1 + _SUBSTR_W]), r["wh"]
        )
    for i, ts in toks.items():
        want = len(ts) - _SUBSTR_W + 1 if len(ts) >= _SUBSTR_W else 0
        assert per_doc.get(i, 0) == want, i
    # hash equal <=> content equal
    for ka, (ca, ha) in content.items():
        for kb, (cb, hb) in content.items():
            assert (ca == cb) == (ha == hb), (ka, kb)


prefix_texts = st.lists(
    st.text(alphabet="abT ", min_size=0, max_size=12),
    min_size=1,
    max_size=25,
)


@given(texts=prefix_texts, nparts=st.integers(min_value=1, max_value=6))
@SETTINGS
def test_prefix_subsumption_matches_bruteforce(sp, texts, nparts):
    """Range-partitioned sort-adjacency subsumption (with boundary-row
    exchange) == the O(n^2) definition (strict prefix of ANY other
    text) for arbitrary corpora — nested chains, duplicates, empty
    strings, shared-prefix clusters — under any partition count
    (boundary rows cross partitions whenever nparts > 1)."""
    from arc_kinesis_tagging_spark.operators.textops import prefix_subsumed_marks

    df = sp.createDataFrame([(t,) for t in texts], "frag string")
    got = {
        r["frag"]: r["subsumed"]
        for r in prefix_subsumed_marks(df, "frag", num_partitions=nparts).collect()
    }
    uniq = set(texts)
    want = {
        a: len(a) > 0 and any(b != a and b.startswith(a) for b in uniq)
        for a in uniq
    }
    assert got == want
