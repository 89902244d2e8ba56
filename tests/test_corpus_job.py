"""End-to-end corpus preparation (plans/corpus_job.py): gates → exact dedup
→ near-dup clustering → keeper selection over the shared documents table
with injected duplicates."""

from __future__ import annotations

from pyspark.sql import functions as F

from scrapy_newsutils_spark.operators import training
from scrapy_newsutils_spark.plans import corpus_job


def test_prepare_corpus_end_to_end(spark, documents_df):
    base = documents_df.limit(120).select("doc_id", "text")
    exact = base.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 900000).alias("doc_id"),
        F.concat(F.col("text"), F.lit("   ")).alias("text"))  # ws-normalized away
    near = base.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 800000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qq")).alias("text"))
    docs = base.unionByName(exact).unionByName(near)

    langs = tuple(sorted(r["lang_pred"] for r in training.analyze_documents(
        base).select("lang_pred").distinct().collect()))
    out, stats = corpus_job.prepare_corpus(
        docs, langs=langs, min_quality=0.0, min_tokens=1,
        jaccard_min=0.6, k_shingle=1, with_stats=True)
    rows = out.collect()
    by_id = {r["doc_id"]: r for r in rows}

    # exact dups never reach the near-dup stage (lowest-id keeper wins)
    assert not any(i >= 900000 for i in by_id)
    assert stats.after_exact < stats.after_gates
    # near-dups clustered with their base: component = the base doc_id
    near_ids = [i for i in by_id if 800000 <= i < 900000]
    assert near_ids, "injected near-dups were gated away"
    for i in near_ids:
        assert not by_id[i]["is_keeper"]
        assert by_id[i]["component"] < 800000  # clustered under a base doc
        if i - 800000 in by_id:  # base may itself have merged further
            assert by_id[i]["component"] == by_id[i - 800000]["component"]
    # keeper invariant: exactly one keeper per component, = component min
    assert all(r["is_keeper"] == (r["doc_id"] == r["component"]) for r in rows)
    assert stats.kept == stats.components
    assert stats.docs_in == docs.count()


def test_prepare_corpus_single_plan(spark, documents_df):
    """Without stats the job returns one unexecuted DataFrame (no eager
    actions besides the component fixpoint) and keeps every gated row."""
    docs = documents_df.limit(60).select("doc_id", "text")
    out = corpus_job.prepare_corpus(docs, langs=("en", "fr", "de", "es"),
                                    min_quality=0.0, min_tokens=1)
    assert {"component", "is_keeper"} <= set(out.columns)
    assert out.count() <= 60
