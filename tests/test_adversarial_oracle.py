"""Adversarial-corpus oracle parity: every oracle-checked registry
query that reads the documents table must hash-match DuckDB on a
corpus the fixtures don't contain — empty text, whitespace-only,
sub-shingle-length docs, repeated tokens, unicode. This is the
permanent guard for the NULL-on-empty-list class of cross-engine
divergence (DuckDB array_to_string/list_sum return NULL on empty
lists; Spark's concat_ws/aggregate return ''/0)."""

import os

import duckdb
import pytest

from arc_kinesis_tagging_spark.plans.registry import QUERIES

import sys

sys.path.insert(0, "/root/repo")
from tools.verify_oracle import canon_rows, driver_canon_check  # noqa: E402

ADVERSARIAL_DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (0, "", "en", "s0", 0),
    (7, "   ", "en", "s0", 3),
    (11, "one", "en", "s1", 3),
    (14, "spark vector", "en", "s1", 12),
    (21, "the the the the the", "en", "s0", 19),
    (22, "café naïve résumé words here", "fr", "s1", 28),
    (28, "a much longer document with enough tokens to produce shingles "
         "and chunks and quality metrics spark", "en", "s0", 99),
    (33, "a much longer document with enough tokens to produce shingles "
         "and chunks and quality metrics spark", "en", "s1", 99),
]

# registry queries whose builders read ONLY the documents table
DOC_QUERIES = [
    "q_array_funcs",
    "q_hof_funcs",
    "q_text_chunk",
    "q_seq_pack",
    "q_pii_scrub",
    "q_contamination",
    "q_text_termfreq",
    "q_text_quality",
    "q_text_langid",
    "q_text_fingerprint",
    "q_quality_filter",
    "q_text_tfidf",
    "q_dedup_exact",
    "q_dedup_ngram_jaccard",
]


@pytest.fixture(scope="module")
def adversarial_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("adversarial-docs"))
    spark.createDataFrame(
        ADVERSARIAL_DOCS,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


@pytest.fixture(scope="module")
def adversarial_duck(adversarial_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{adversarial_dir}/documents.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_adversarial_oracle_parity(spark, adversarial_dir, adversarial_duck, name):
    q = QUERIES[name]
    sdf = q.builder(spark, adversarial_dir).toPandas()
    driver_canon_check(sdf)
    if q.oracle is None:
        return  # rows-only op: the point is it must not crash
    odf = adversarial_duck.execute(q.oracle).df()
    scols, srows = canon_rows(sdf)
    ocols, orows = canon_rows(odf)
    assert scols == ocols
    assert srows == orows


# --- embeddings-reading queries ---------------------------------------------

ADVERSARIAL_VECS = [
    # zero vector (ANSI divide-by-zero + NaN-sort traps), exact dup,
    # near dup, all-negative components
    (0, [0.0, 0.0, 0.0, 0.0], "a"),
    (1, [1.0, 0.0, 0.0, 0.0], "a"),
    (2, [1.0, 0.0, 0.0, 0.0], "b"),
    (3, [0.99, 0.01, 0.0, 0.0], "b"),
    (4, [-1.0, -1.0, -1.0, -1.0], "a"),
]

EMB_QUERIES = [
    "q_dedup_embedding",
    "q_similarity_topk",
    "q_vector_centroid",
    "q_vector_normalize",
]


@pytest.fixture(scope="module")
def adversarial_emb_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("adversarial-emb"))
    spark.createDataFrame(
        ADVERSARIAL_VECS, "vec_id long, embedding array<double>, label string"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "embeddings.parquet"))
    return d


@pytest.fixture(scope="module")
def adversarial_emb_duck(adversarial_emb_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{adversarial_emb_dir}/embeddings.parquet/*.parquet')"
    )
    return con


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_adversarial_embedding_parity(spark, adversarial_emb_dir, adversarial_emb_duck, name):
    q = QUERIES[name]
    sdf = q.builder(spark, adversarial_emb_dir).toPandas()
    driver_canon_check(sdf)
    if q.oracle is None:
        return
    odf = adversarial_emb_duck.execute(q.oracle).df()
    assert canon_rows(sdf) == canon_rows(odf)
