"""Scale smoke: run the LLM-pipeline operators on a synthetically
amplified corpus (10x the sf0.1 documents/embeddings) and report
per-stage wall clock — evidence that the operator shapes hold as data
grows, not just at test SF.

Amplification (deterministic, no RNG):
- documents: each source doc replicated K times; replica i appends i
  distinct salt tokens, so replicas of one doc form a true near-dup
  cluster (jaccard ~0.85-1.0) while cross-doc pairs stay dissimilar.
- embeddings: each vector replicated K times with a deterministic
  small per-replica offset on one dimension.

Usage: python tools/scale_smoke.py [K] (default 10 -> 50k docs)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.operators.clusters import dedup_keep_best
from arc_kinesis_tagging_spark.operators.dedup import dedup_exact, minhash_near_duplicates
from arc_kinesis_tagging_spark.operators.similarity import (
    cosine_topk_bruteforce_np,
    cosine_topk_ivf,
)
from arc_kinesis_tagging_spark.session import get_session
from arc_kinesis_tagging_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"


def amplify_docs(spark, k: int):
    d = load_table(spark, "documents", SF_DIR)
    reps = spark.range(k).withColumnRenamed("id", "rep")
    out = (
        d.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") * k + F.col("rep"))
        .withColumn(
            "text",
            F.concat(
                F.col("text"),
                F.when(F.col("rep") == 0, F.lit("")).otherwise(
                    F.concat(
                        F.lit(" "),
                        F.concat_ws(
                            " ",
                            F.transform(
                                F.sequence(F.lit(1), F.col("rep").cast("int")),
                                # salt unique per (doc, rep): replicas of
                                # one doc are near-dups of each other,
                                # but never of another doc's replicas —
                                # otherwise salts shared across docs
                                # merge everything into giant components
                                lambda i: F.concat(
                                    F.lit("salt"),
                                    F.md5(
                                        F.concat_ws(
                                            ":", F.col("doc_id").cast("string"), i.cast("string")
                                        )
                                    ),
                                ),
                            ),
                        ),
                    )
                ),
            ),
        )
        .drop("rep")
    )
    return out


def amplify_docs_zipf(spark, k: int):
    """Non-adversarial amplifier (round-8 verdict task 4): replica i
    appends i tokens drawn LOG-UNIFORMLY over a FIXED 4096-token
    vocabulary ("zipf1".."zipf4096"; rank = 4096^u for a deterministic
    md5-derived u, so rank r carries ~1/r mass — the Zipf shape real
    corpora have). Unlike the salt amplifier, the appended vocabulary
    SATURATES: distinct tokens stay <= 4096 at every K (Heaps-law
    behavior), so vocabulary-sensitive operators (tokenizer encode,
    LM/ARPA model builds, DSIR gram tables) see realistic growth, and
    any super-linear ladder row left under THIS mode is the
    operator's fault, not the fixture's. Near-dup/clustering stages
    must keep using the salt amplifier — shared tokens across docs
    would merge everything into giant components by construction."""
    d = load_table(spark, "documents", SF_DIR)
    reps = spark.range(k).withColumnRenamed("id", "rep")
    return (
        d.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("doc_id") * k + F.col("rep"))
        .withColumn(
            "text",
            F.concat(
                F.col("text"),
                F.when(F.col("rep") == 0, F.lit("")).otherwise(
                    F.concat(
                        F.lit(" "),
                        F.concat_ws(
                            " ",
                            F.transform(
                                F.sequence(F.lit(1), F.col("rep").cast("int")),
                                lambda i: F.concat(
                                    F.lit("zipf"),
                                    F.greatest(
                                        F.lit(1),
                                        F.pow(F.lit(4096.0), _zipf_u(i))
                                        .cast("int"),
                                    ).cast("string"),
                                ),
                            ),
                        ),
                    )
                ),
            ),
        )
        .drop("rep")
    )


def _zipf_u(i):
    """Deterministic uniform in [0,1) per (doc replica token): md5 of
    (doc_id, rep, i) — no RNG, stable across runs and partitions."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("doc_id").cast("string"),
                        F.col("rep").cast("string"),
                        i.cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**8))
    )


def amplify_embeddings(spark, k: int):
    e = load_table(spark, "embeddings", SF_DIR)
    reps = spark.range(k).withColumnRenamed("id", "rep")
    return (
        e.crossJoin(F.broadcast(reps))
        .withColumn("vec_id", F.col("vec_id") * k + F.col("rep"))
        .withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda v, i: v + (F.col("rep") % 7).cast("float") * F.lit(0.001) * (i == 0).cast("int").cast("float"),
            ),
        )
        .drop("rep")
    )


def amplify_events(spark, k: int):
    """Replicate every user K times, shifting each replica's clock by
    `rep` years. Per-user event sequences (funnels, paths) are
    preserved exactly; (event_type, hour) co-activity buckets stay
    their ORIGINAL size because replicas live in disjoint hours — so
    graph stages scale linearly in K instead of K^2 edges / K^3
    triangles, which is the bounded-bucket shape a real pipeline
    enforces anyway."""
    ev = load_table(spark, "events", SF_DIR)
    reps = spark.range(k).withColumnRenamed("id", "rep")
    return (
        ev.crossJoin(F.broadcast(reps))
        .withColumn("user_id", F.col("user_id") * k + F.col("rep"))
        .withColumn("event_id", F.col("event_id") * k + F.col("rep"))
        .withColumn("ts", F.expr("timestampadd(YEAR, CAST(rep AS INT), ts)"))
        .drop("rep")
    )


def amplified_sf_dir(spark, k: int, mode: str = "salt") -> str:
    """Write the amplified documents + events as a registry-compatible
    sf_dir so ladder stages run the EXACT registry query code."""
    import os

    amp = f"/tmp/akt_amp_k{k}" if mode == "salt" else f"/tmp/akt_amp_{mode}_k{k}"
    docs_p, ev_p = f"{amp}/documents.parquet", f"{amp}/events.parquet"
    make_docs = amplify_docs if mode == "salt" else amplify_docs_zipf
    if not os.path.exists(docs_p):
        make_docs(spark, k).write.mode("overwrite").parquet(docs_p)
    if not os.path.exists(ev_p):
        amplify_events(spark, k).write.mode("overwrite").parquet(ev_p)
    return amp


def containment_ladder(spark, k: int) -> None:
    """Focused containment-join ladder (round-14 verdict task 6): the
    prefix lemma's candidate bound is PROVEN lossless, but its GROWTH
    under corpus amplification was asserted, not measured — the
    Jaccard twin has ladder rows, the full-index side of the
    containment join did not. Measures, at amplification K over the
    salt corpus (replicas of one doc are true near-dup clusters,
    cross-doc pairs dissimilar — the worst realistic case for a
    near-dup join):

    - candidate pair volume (the pruned prefix x full-index join
      after positional filtering and pair dedup — the quantity the
      lemma bounds, counted from the PRODUCTION code path via
      operators/dedup._containment_candidates), plus its wall clock;
    - the full verified join's emitted pairs and wall clock;
    - shingle-row volume (the linear-in-K baseline the candidate
      growth is judged against).

    Sub-quadratic evidence = candidates(K=10)/candidates(K=2) well
    below (10/2)^2 = 25 (in-group true pairs alone grow ~K^2/2 per
    doc group by construction, so the interesting ratio is
    candidates vs TRUE pairs, also reported)."""
    from arc_kinesis_tagging_spark.operators.dedup import (
        _containment_candidates,
        ngram_containment_pairs,
    )

    report: dict = {"k": k, "mode": "containment"}
    amp = amplified_sf_dir(spark, k)
    docs = load_table(spark, "documents", amp)
    report["n_docs"] = docs.count()
    report["shingle_rows"] = docs.select(
        F.explode(
            F.expr(
                "array_distinct(transform(sequence(1, greatest(size(split(text, '\\\\s+')) - 2, 0)),"
                " i -> concat_ws(' ', slice(split(text, '\\\\s+'), i, 3))))"
            )
        )
    ).count()
    t0 = time.perf_counter()
    _, cand = _containment_candidates(docs, "text", "doc_id", 0.8, 3)
    report["candidates"] = cand.count()
    report["candidates_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    pairs = ngram_containment_pairs(
        docs, "text", "doc_id", threshold=0.8, shingle_n=3
    )
    report["pairs"] = pairs.count()
    report["pairs_sec"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(report))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    k = int(args[0]) if args else 10
    spark = get_session("scale-smoke")
    if "--containment" in sys.argv:
        containment_ladder(spark, k)
        return
    if "--zipf" in sys.argv:
        # Focused vocabulary ladder under the NON-adversarial amplifier
        # (round-8 verdict task 4): the salt amplifier grows distinct
        # vocabulary linearly in the corpus, which contaminates the
        # rows of vocabulary-sensitive operators; under the bounded
        # Zipfian vocabulary those operators should return to ~linear,
        # or the super-linearity is real.
        from arc_kinesis_tagging_spark.operators.lm import (
            export_arpa_bigram,
            read_arpa,
        )
        from arc_kinesis_tagging_spark.plans.registry import QUERIES

        only = None  # --only a,b,c restricts the stage list (chunked
        for a in sys.argv[1:]:  # runs keep each invocation inside an
            if a.startswith("--only="):  # external per-process timeout)
                only = set(a.split("=", 1)[1].split(","))
        report = {"k": k, "mode": "zipf"}
        amp = amplified_sf_dir(spark, k, mode="zipf")
        zdocs = load_table(spark, "documents", amp)
        report["n_docs"] = zdocs.count()
        report["distinct_words"] = (
            zdocs.select(F.explode(F.split("text", r"\s+")).alias("w"))
            .filter(F.col("w") != "")
            .select("w")
            .distinct()
            .count()
        )
        for qname in (
            "q_unigram_encode",
            "q_dsir_score",
            "q_ngram_lm_score",
            "q_ngram_lm_pruned",
            "q_lm_buckets",
            "q_lm_arpa",
            "q_wordpiece_encode",
        ):
            if only is not None and qname not in only:
                continue
            t0 = time.perf_counter()
            report[f"{qname}_rows"] = QUERIES[qname].builder(spark, amp).count()
            report[f"{qname}_sec"] = round(time.perf_counter() - t0, 2)
        if only is None or "arpa_full" in only:
            t0 = time.perf_counter()
            _, _, fbi = read_arpa(
                export_arpa_bigram(zdocs, f"/tmp/akt_amp_zipf_full_k{k}.arpa")
            )
            report["arpa_full_sec"] = round(time.perf_counter() - t0, 2)
            report["arpa_full_bigrams"] = len(fbi)
        print(json.dumps(report))
        return
    report: dict = {"k": k}

    docs = amplify_docs(spark, k).persist()
    report["n_docs"] = docs.count()

    t0 = time.perf_counter()
    n_exact = dedup_exact(docs, "text", "doc_id").count()
    report["exact_dedup_sec"] = round(time.perf_counter() - t0, 2)
    report["exact_groups"] = n_exact

    t0 = time.perf_counter()
    pairs = minhash_near_duplicates(
        docs, "text", "doc_id", n_hashes=32, bands=8, shingle_n=3, jaccard_threshold=0.5
    ).persist()
    report["minhash_pairs"] = pairs.count()
    report["minhash_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    kept = dedup_keep_best(docs.select("doc_id", "n_chars"), pairs, "doc_id", "n_chars")
    report["survivors"] = kept.count()
    report["cluster_dedup_sec"] = round(time.perf_counter() - t0, 2)

    emb = amplify_embeddings(spark, k).persist()
    report["n_vectors"] = emb.count()
    q = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    t0 = time.perf_counter()
    report["brute_topk_rows"] = cosine_topk_bruteforce_np(emb, q, k=5).count()
    report["brute_topk_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    report["ivf_topk_rows"] = cosine_topk_ivf(emb, q, k=5, nlist=32, nprobe=4).count()
    report["ivf_topk_sec"] = round(time.perf_counter() - t0, 2)

    # round-7 late: OPQ assignment over the amplified corpus — training
    # cost is K-invariant (bounded sample), so the stage should scale
    # with the map-only assignment pass alone
    from arc_kinesis_tagging_spark.operators.similarity import opq_assign

    t0 = time.perf_counter()
    report["opq_assign_rows"] = opq_assign(emb, 4, 16).count()
    report["opq_assign_sec"] = round(time.perf_counter() - t0, 2)

    from arc_kinesis_tagging_spark.operators.similarity import cosine_threshold_pairs

    t0 = time.perf_counter()
    report["threshold_pairs_rows"] = cosine_threshold_pairs(
        emb, threshold=0.9, nlist=32
    ).count()
    report["threshold_pairs_sec"] = round(time.perf_counter() - t0, 2)

    # --- round-5 operators on the amplified corpus ---
    from arc_kinesis_tagging_spark.operators.textops import (
        dedup_segments,
        heavy_hitters,
    )

    t0 = time.perf_counter()
    seg = dedup_segments(docs, "doc_id", "text").agg(
        F.count(F.lit(1)), F.sum("n_kept")
    ).collect()[0]
    report["segment_dedup_docs"] = seg[0]
    report["segment_dedup_kept"] = int(seg[1])
    report["segment_dedup_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    report["heavy_hitters_rows"] = heavy_hitters(docs, "text", phi=0.02).count()
    report["heavy_hitters_sec"] = round(time.perf_counter() - t0, 2)

    from arc_kinesis_tagging_spark.operators.similarity import kmeans_lloyd

    t0 = time.perf_counter()
    _assign, _C, iters = kmeans_lloyd(emb, k=32, max_iters=5)
    report["kmeans_iters"] = iters
    report["kmeans_sec"] = round(time.perf_counter() - t0, 2)

    from arc_kinesis_tagging_spark.operators.dedup import (
        minhash_fresh_against_corpus,
        write_minhash_corpus,
    )

    t0 = time.perf_counter()
    corpus_side = docs.filter(F.col("doc_id") % k != 0)
    batch_side = docs.filter(F.col("doc_id") % k == 0)
    write_minhash_corpus(
        spark, corpus_side, "akt_smoke_mh", "text", "doc_id",
        n_hashes=16, bands=8,
    )
    report["incremental_mh_fresh"] = minhash_fresh_against_corpus(
        spark, batch_side, "akt_smoke_mh", "text", "doc_id",
        n_hashes=16, bands=8, jaccard_threshold=0.5,
    ).count()
    report["incremental_mh_batch"] = batch_side.count()
    report["incremental_mh_sec"] = round(time.perf_counter() - t0, 2)

    # --- round-6 ladder fill (VERDICT r05 #4): registry queries over a
    # written amplified sf_dir, so the measured code is the exact
    # query code, and media decode throughput ---
    from arc_kinesis_tagging_spark.plans.registry import QUERIES

    amp = amplified_sf_dir(spark, k)
    for qname in (
        "q_text_repetition",
        "q_corpus_pipeline2",
        "q_events_funnel_k",
        "q_events_pathing",
        # round-6 operators
        "q_ngram_lm_score",
        # round-7: tail-pruned model — the bounded-model-join twin,
        # expected sub-linear in K where the unpruned join is linear+
        "q_ngram_lm_pruned",
        # round-7: histogram-tertile bucketing + BM25 retrieval + the
        # bucket->prefix-dedup composite
        "q_lm_buckets",
        "q_text_bm25",
        "q_corpus_pipeline5",
        "q_dedup_prefix",
        "q_robots_gate",
        "q_dedup_substring",
        "q_corpus_pipeline4",
        # round-7 late: ARPA train->export->import->score loop; the
        # model grows with vocabulary (slowly), the scoring joins with
        # the corpus — expected ~linear in K like the self-trained gate
        "q_lm_arpa",
        # round-7 late: DSIR scoring — the 256-bucket model tables are
        # size-invariant in K, so cost should track the gram explode
        # (linear) with a flat model-join term
        "q_dsir_score",
        # round-7 late: unigram-LM tokenizer — EM runs on the distinct
        # -word table, which saturates under replica amplification, so
        # train cost should go FLAT in K while encode tracks docs
        "q_unigram_encode",
        # round-10: perceptual near-dup over image/video/audio — media
        # is synthesized from doc_id, so the amplified table drives K x
        # codec+hash work directly; hashing is map-only, candidates are
        # band-bucket co-occupancy. The TRUE (in-group) pairs are
        # linear in K by construction (6 x N/4); on top of that,
        # fixed-width fingerprints accumulate birthday-style
        # cross-group near-collisions as the group count grows — the
        # realistic 100 TB load the banded+verify pipeline must absorb
        # without all-pairs (split quantified in SCALE.md round 10)
        "q_dedup_phash",
        "q_dedup_vhash",
        "q_dedup_ahash",
    ):
        t0 = time.perf_counter()
        report[f"{qname}_rows"] = QUERIES[qname].builder(spark, amp).count()
        report[f"{qname}_sec"] = round(time.perf_counter() - t0, 2)

    # triangles: the sf0.1 co-activity graph is near-complete (hour
    # buckets x 1500 users), so the OUTPUT is ~200M triples per K unit
    # — the cost driver is result size, not the plan. The year-shifted
    # amplification makes growth exactly linear in K (replicas never
    # co-occur), so measure at min(k, 4) and extrapolate; K=2 vs K=4
    # doubling is the no-superlinear-blowup evidence.
    k_tri = min(k, 4)
    tri_amp = amplified_sf_dir(spark, k_tri) if k_tri != k else amp
    t0 = time.perf_counter()
    report["q_graph_triangles_k"] = k_tri
    report["q_graph_triangles_rows"] = (
        QUERIES["q_graph_triangles"].builder(spark, tri_amp).count()
    )
    report["q_graph_triangles_sec"] = round(time.perf_counter() - t0, 2)

    from arc_kinesis_tagging_spark.operators.multimodal import (
        attach_jpeg420_media,
        attach_jpeg_media,
        attach_png_media,
        decode_jpeg,
        decode_jpeg420,
        decode_png,
    )

    n_img = 500 * k
    ids = spark.range(n_img).withColumnRenamed("id", "doc_id")
    for name, attach, dec in (
        ("jpeg", attach_jpeg_media, decode_jpeg),
        ("jpeg420", attach_jpeg420_media, decode_jpeg420),
        ("png", attach_png_media, decode_png),
    ):
        t0 = time.perf_counter()
        n = dec(attach(ids, "doc_id")).count()
        dt = time.perf_counter() - t0
        report[f"{name}_images"] = n
        report[f"{name}_images_per_sec"] = round(n / dt, 1)

    # round-8 ladder fill (VERDICT r07 #6): GIF / WAV / Y4M codec
    # throughput — all map-only Arrow passes, so rows/sec should hold
    # flat as K grows (any fall-off means a batch-shape problem, not
    # an algorithmic one)
    from arc_kinesis_tagging_spark.operators.multimodal import (
        attach_gif_media,
        attach_wav_media,
        attach_y4m_media,
        decode_gif,
        decode_wav,
        sample_y4m_frames,
    )

    for name, attach, dec in (
        ("gif", attach_gif_media, decode_gif),
        ("wav", attach_wav_media, decode_wav),
        ("y4m", attach_y4m_media, lambda d: sample_y4m_frames(d, every=2)),
    ):
        t0 = time.perf_counter()
        n = dec(attach(ids, "doc_id")).count()
        dt = time.perf_counter() - t0
        report[f"{name}_rows"] = n
        report[f"{name}_rows_per_sec"] = round(n / dt, 1)

    # round-8: tar-shard container round-trip at scale — build shards
    # from the amplified docs (bounded groupBy per shard), parse them
    # back (one map-only pass); parse throughput is the ladder metric
    from arc_kinesis_tagging_spark.sources.tar_shards import (
        build_doc_shards,
        read_doc_shards,
    )

    shards = build_doc_shards(docs, shard_size=10).persist()
    report["tar_shards"] = shards.count()  # materialize build first
    t0 = time.perf_counter()
    n = read_doc_shards(shards).count()
    dt = time.perf_counter() - t0
    shards.unpersist()
    report["tar_parse_rows"] = n
    report["tar_parse_rows_per_sec"] = round(n / dt, 1)

    # round-8: KenLM-style singleton pruning bounds the ARPA artifact
    # on vocabulary-adversarial corpora — every retained bigram was
    # seen >= 2x, so the salt-injected singletons (which make the raw
    # model grow with the corpus) drop distributedly BEFORE the
    # model-sized collect. n_bigrams full-vs-pruned is the evidence.
    from arc_kinesis_tagging_spark.operators.lm import (
        export_arpa_bigram,
        read_arpa,
    )

    amp_docs = load_table(spark, "documents", amp)
    t0 = time.perf_counter()
    _, _, fbi = read_arpa(
        export_arpa_bigram(amp_docs, f"/tmp/akt_amp_full_k{k}.arpa")
    )
    report["arpa_full_sec"] = round(time.perf_counter() - t0, 2)
    report["arpa_full_bigrams"] = len(fbi)
    t0 = time.perf_counter()
    _, _, pbi = read_arpa(
        export_arpa_bigram(
            amp_docs, f"/tmp/akt_amp_pruned_k{k}.arpa", prune_count=1
        )
    )
    report["arpa_pruned_sec"] = round(time.perf_counter() - t0, 2)
    report["arpa_pruned_bigrams"] = len(pbi)

    # round-8: the composed ANN lifecycle (build+append+retrain+serve)
    # on the amplified embeddings — fresh index path per K, so the
    # measured time includes the whole chain, not a memoized probe
    from arc_kinesis_tagging_spark.operators.similarity import ann_lifecycle

    q_lc = emb.filter(F.col("vec_id") < 8 * k).filter(
        F.col("vec_id") % k == 0
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    t0 = time.perf_counter()
    report["ann_lifecycle_rows"] = ann_lifecycle(
        spark, emb, F.col("vec_id") % 5 == 0,
        f"/tmp/akt_amp_lc_k{k}", q_lc,
        k=5, nlist=8, m_subspaces=8, ksub=16, nprobe=6, shortlist=64,
        drift_num=1, drift_den=1,
    ).count()
    report["ann_lifecycle_sec"] = round(time.perf_counter() - t0, 2)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
