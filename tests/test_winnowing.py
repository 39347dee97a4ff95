"""Winnowing fingerprints (plans/llmops.py:q_text_winnowing): parity
with an independent pure-Python implementation of the
Schleimer/Wilkerson/Aiken algorithm (k=5, w=4, rightmost-min robust
rule), and the paper's coverage guarantee — two documents sharing a
substring of length >= k + w - 1 share a fingerprint hash.
"""

import hashlib

from arc_kinesis_tagging_spark.plans.llmops import q_text_winnowing
from arc_kinesis_tagging_spark.sources.tables import load_table

K, W = 5, 4


def _h(gram: str) -> int:
    return int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:15], 16)


def _winnow(text: str):
    """Reference winnowing: selected set of (pos, hash), 1-based
    positions, rightmost minimum per window."""
    hs = [_h(text[i : i + K]) for i in range(len(text) - K + 1)]
    sel = set()
    for j in range(len(hs) - W + 1):
        best_h, best_p = None, None
        for o in range(W):
            if best_h is None or hs[j + o] <= best_h:
                best_h, best_p = hs[j + o], j + o
        sel.add((best_p + 1, best_h))
    return sel


def test_winnowing_matches_python_reference(spark, sf_dir):
    rows = {r["doc_id"]: r for r in q_text_winnowing(spark, sf_dir).collect()}
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, "documents", sf_dir)
        .select("doc_id", "text")
        .collect()
    }
    assert set(rows) == set(docs)
    for did, text in docs.items():
        sel = _winnow(text)
        want_xor = 0
        for _p, h in sel:
            want_xor ^= h
        r = rows[did]
        assert r["n_grams"] == max(len(text) - K + 1, 0), did
        assert r["n_fps"] == len(sel), did
        assert r["fp_xor"] == want_xor, did


def test_winnowing_shared_substring_guarantee(spark):
    """Any substring of length >= k + w - 1 = 8 shared between two
    documents forces at least one common selected hash — the MOSS
    detection guarantee. Build pairs embedding the same 12-char needle
    in different contexts and check fingerprint intersection."""
    needle = "abcdewxyz123"
    docs = [
        (0, f"prefix-one {needle} suffix-one"),
        (1, f"Z{needle}Z totally different padding text here"),
        (2, "no shared needle anywhere in this document at all"),
    ]
    sels = {did: {h for _p, h in _winnow(t)} for did, t in docs}
    assert sels[0] & sels[1], "shared 12-char substring must intersect"

    # and the Spark side reproduces those fingerprints' XOR/count
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from pyspark.sql import functions as F

    # reuse the registry query's expression path via a temp sf_dir-less
    # call: clone the plan by registering the frame as 'documents'
    import tempfile, os

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    rows = {r["doc_id"]: r for r in q_text_winnowing(spark, d).collect()}
    for did, t in docs:
        sel = _winnow(t)
        x = 0
        for _p, h in sel:
            x ^= h
        assert rows[did]["n_fps"] == len(sel)
        assert rows[did]["fp_xor"] == x


def test_winnowing_short_and_tie_edge(spark):
    """Docs shorter than k + w - 1 emit no fingerprint (0, 0); a
    repeated-character doc (all gram hashes equal) exercises the
    rightmost-tie rule — every window selects its LAST gram, so the
    fingerprint count equals the window count."""
    docs = [(0, "short"), (1, "aaaaaaaaaaaa"), (2, "")]
    import tempfile, os

    d = tempfile.mkdtemp()
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    rows = {r["doc_id"]: r for r in q_text_winnowing(spark, d).collect()}

    assert (rows[0]["n_fps"], rows[0]["fp_xor"]) == (0, 0)  # 1 gram, no window
    assert (rows[2]["n_grams"], rows[2]["n_fps"], rows[2]["fp_xor"]) == (0, 0, 0)

    t = "aaaaaaaaaaaa"  # 12 chars -> 8 grams -> 5 windows, all ties
    sel = _winnow(t)
    # rightmost rule: window j selects position j + W (1-based), all
    # sharing one hash value -> 5 distinct (pos, hash) pairs, XOR of an
    # odd count of equal hashes = the hash itself
    assert rows[1]["n_fps"] == len(sel) == 5
    assert rows[1]["fp_xor"] == _h("aaaaa")


def test_winnowing_xxhash_flag_structure(spark, monkeypatch):
    """AKT_WINNOW_HASH=xxhash64: same algorithm under a different hash
    order — gram/row counts unchanged, repeated-char docs still select
    one gram per window (hash-agnostic ties), output deterministic
    across two runs, and n_fps stays within the winnowing density
    bounds (at least one fingerprint per disjoint window block, at
    most one per window)."""
    docs = [(0, "the quick brown fox jumps over the lazy dog"),
            (1, "aaaaaaaaaaaa"), (2, "short")]
    import os, tempfile

    d = tempfile.mkdtemp()
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))

    monkeypatch.setenv("AKT_WINNOW_HASH", "xxhash64")
    r1 = {r["doc_id"]: r for r in q_text_winnowing(spark, d).collect()}
    r2 = {r["doc_id"]: r for r in q_text_winnowing(spark, d).collect()}
    assert r1 == r2  # deterministic
    monkeypatch.delenv("AKT_WINNOW_HASH")
    rmd = {r["doc_id"]: r for r in q_text_winnowing(spark, d).collect()}

    for did, t in docs:
        assert r1[did]["n_grams"] == rmd[did]["n_grams"] == max(len(t) - K + 1, 0)
    n_wins = len(docs[0][1]) - K + 1 - W + 1
    assert 1 <= r1[0]["n_fps"] <= n_wins
    assert r1[1]["n_fps"] == 5 and rmd[1]["n_fps"] == 5  # tie rule, hash-agnostic
    assert r1[2]["n_fps"] == 0


def test_winnowing_kernel_matches_expression_form(spark, monkeypatch):
    """Round-15 batch-native kernel (default path) must produce the
    IDENTICAL rows as the pure-Catalyst expression form it replaced
    (AKT_WINNOW_IMPL=expr, kept as the witness): same md5 gram
    hashes, same rightmost-min tie rule, same distinct-pair count and
    xor — over edge shapes (empty, sub-k, sub-window, all-ties,
    multibyte) and the fixture corpus."""
    import os
    import tempfile

    docs = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "aaaaaaaaaaaa"),       # all-tie hashes: rightmost rule
        (2, "short"),              # exactly k chars: 1 gram, no window
        (3, "tiny"),               # < k chars: 0 grams
        (4, ""),                   # empty
        (5, "abcdefgh"),           # exactly k+w-1: one window
        (6, "naïve café ütf-8 ラーメン text"),  # multibyte chars
        (7, "ab ab ab ab ab ab"),  # periodic ties
    ]
    d = tempfile.mkdtemp()
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))

    kern = sorted(map(tuple, q_text_winnowing(spark, d).collect()))
    monkeypatch.setenv("AKT_WINNOW_IMPL", "expr")
    expr = sorted(map(tuple, q_text_winnowing(spark, d).collect()))
    assert kern == expr
    assert len(kern) == len(docs)
