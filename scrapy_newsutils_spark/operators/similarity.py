"""TF-IDF all-pairs similarity + sibling/related banding (A1, J5, J6, W1).

Reference semantics: per-day corpus TF-IDF cosine
(/root/reference/src/newsutils/nlp.py:64-74,117-137), per-post top-n ≥
threshold per band (conf/mixins.py:86-104), bands processed in descending
threshold order so related = result − siblings (nlp.py:124-137); thresholds
siblings .4 / related .2, top_n = 2 (conf/posts.py:163-165).

Engine shape — the scalable sparse path, NOT the reference's dense
doc×corpus matrix:

  tokens → explode → (doc, term, tf) → join doc-freq agg → tf-idf weight
  → L2-normalize per doc → self-join on term → groupBy(pair) Σ products
  = cosine (sparse dot product; only term-sharing pairs ever materialize).

Every stage is a plain shuffle on term or pair keys — no crossJoin, no
driver-side matrix, survives corpora where n²/day is infeasible. Hot terms
(stopword-like df ≈ N) are the skew risk at scale: ``max_df_ratio`` prunes
them (they carry ≈ zero idf weight anyway), which bounds per-term join
fan-out — the classic prefix-filter optimization.

The symmetric matrix is computed once as (a < b) pairs then mirrored —
the half-matrix TODO the reference never shipped (nlp.py:113-114).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens_of

SIBLINGS_THRESHOLD = 0.4
RELATED_THRESHOLD = 0.2
MAX_DOCS = 2


def get_post_text(title: str = "title", text: str = "text") -> F.Column:
    """Reference corpus-text strategy: title + '. ' + body
    (/root/reference/src/newsutils/conf/mixins.py:135-154 — add_fullstop on
    the title, then concatenation)."""
    t = F.col(title)
    dotted = F.when(t.rlike(r"[.!?…]\s*$"), t).otherwise(F.concat(t, F.lit(".")))
    return F.concat_ws(" ", dotted, F.col(text))


def tfidf_vectors(docs: DataFrame, id_col: str, text_col,
                  max_df_ratio: float = 0.5) -> DataFrame:
    """(id, term, weight) with L2-normalized smooth tf-idf weights
    (tf · (ln((1+N)/(1+df)) + 1), sklearn-style smoothing — the reference's
    TfidfVectorizer is external, semantics inferred from call sites)."""
    n_docs = docs.count()
    terms = (
        docs.select(F.col(id_col).alias("doc"), text_col.alias("_text"))
        .select("doc", F.explode(tokens_of(F.col("_text"))).alias("term"))
        .groupBy("doc", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_counts = terms.groupBy("term").agg(F.countDistinct("doc").alias("df"))
    if max_df_ratio < 1.0:
        df_counts = df_counts.where(F.col("df") <= int(max(n_docs * max_df_ratio, 1)))
    weighted = terms.join(df_counts, "term").withColumn(
        "w",
        F.col("tf")
        * (F.log((F.lit(1.0) + n_docs) / (F.lit(1.0) + F.col("df"))) + F.lit(1.0)),
    )
    norms = weighted.groupBy("doc").agg(F.sqrt(F.sum(F.col("w") ** 2)).alias("norm"))
    return (
        weighted.join(norms, "doc")
        .select("doc", "term", (F.col("w") / F.col("norm")).alias("weight"))
    )


def cosine_pairs(vectors: DataFrame, min_score: float = 0.0) -> DataFrame:
    """Sparse all-pairs cosine: (a, b, score) with a < b, score ≥ min_score."""
    left = vectors.select(F.col("doc").alias("a"), "term",
                          F.col("weight").alias("wa"))
    right = vectors.select(F.col("doc").alias("b"), "term",
                           F.col("weight").alias("wb"))
    pairs = (
        left.join(right, "term")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("score"))
    )
    return pairs.where(F.col("score") >= min_score)


def mirror_pairs(half: DataFrame) -> DataFrame:
    """(a<b) half-matrix → full directed edge list (src, dst, score)."""
    fwd = half.select(F.col("a").alias("src"), F.col("b").alias("dst"), "score")
    rev = half.select(F.col("b").alias("src"), F.col("a").alias("dst"), "score")
    return fwd.unionByName(rev)


def banded_top_n(edges: DataFrame,
                 siblings_threshold: float = SIBLINGS_THRESHOLD,
                 related_threshold: float = RELATED_THRESHOLD,
                 top_n: int = MAX_DOCS,
                 bands: list[tuple[str, float, int]] | None = None) -> DataFrame:
    """Assign each directed edge a band and keep the reference's per-band
    doc sets (J6).

    Reference semantics (nlp.py:102-137 ``save_similarity`` + ``dictdiff``,
    conf/mixins.py:86-104): per band in DESCENDING threshold order, the
    band's candidate set is the top-n docs among *all* edges with
    score ≥ that band's threshold — so a high-score doc is a candidate for
    every band — and the stored set is candidates minus the union of all
    higher bands' stored sets (``overlap=False``). By induction that union
    equals the union of higher bands' *candidate* sets, so:

        row ∈ band_i  ⟺  row ∈ candidates_i  ∧  row ∉ candidates_h ∀ h < i

    Single-window plan: because edges with score ≥ t_i form a prefix of the
    (score DESC, dst ASC) order, a row's rank among the ≥ t_i subset equals
    its global rank — one row_number() window evaluates every band's
    candidate test, no per-band shuffles and no array_except join-back.

    The distinguishing case vs naive score-axis banding: scores
    [.9, .8, .7, .3] with top_n=2 → siblings=[.9, .8], related=[] (the
    reference subtracts the sibling candidates [.9, .8] from the related
    candidates [.9, .8]); score-axis banding would wrongly emit
    related=[.3]. Oracle-verified by the ``similarity_bands`` driver query.
    """
    if bands is None:
        bands = [("siblings", siblings_threshold, top_n),
                 ("related", related_threshold, top_n)]
    bands = sorted(bands, key=lambda b: -b[1])  # W4: desc threshold order
    min_t = bands[-1][1]
    w = Window.partitionBy("src").orderBy(F.col("score").desc(),
                                          F.col("dst").asc())
    ranked = (
        edges.where(F.col("score") >= min_t)
        .withColumn("rank", F.row_number().over(w))
    )
    band_col = F.lit(None).cast("string")
    expr = None
    for name, t, n in bands:
        cond = (F.col("score") >= t) & (F.col("rank") <= n)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    band_col = expr.otherwise(F.lit(None))
    return (
        ranked.withColumn("band", band_col)
        .where(F.col("band").isNotNull())
        .drop("rank")
    )


def similarity_lists(banded: DataFrame) -> DataFrame:
    """Collapse banded edges to per-post siblings/related array<struct>
    columns (the Post schema's storage shape, SURVEY §1.2)."""
    per_band = (
        banded.groupBy("src", "band")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("score"), F.col("dst"))), asc=False
                ),
                lambda s: F.struct(s["dst"].alias("post_id"), s["score"].alias("score")),
            ).alias("refs")
        )
    )
    return (
        per_band.groupBy("src")
        .pivot("band", ["siblings", "related"])
        .agg(F.first("refs"))
        .select(
            F.col("src").alias("post_id"),
            F.coalesce("siblings", F.array().cast(
                "array<struct<post_id:long,score:double>>")).alias("siblings"),
            F.coalesce("related", F.array().cast(
                "array<struct<post_id:long,score:double>>")).alias("related"),
        )
    )


def expand_refs(posts: DataFrame, refs_col: str = "siblings") -> DataFrame:
    """J4: stored {post_id, score} refs back to full rows; dangling refs
    drop out via the inner join (/root/reference/src/newsutils/nlp.py:343-362)."""
    edges = posts.select(
        F.col("post_id").alias("src"), F.explode(refs_col).alias("ref")
    ).select("src", F.col("ref.post_id").alias("post_id"), F.col("ref.score").alias("score"))
    return edges.join(posts, "post_id", "inner")


def expand_related(posts: DataFrame,
                   fields: tuple[str, ...] = ("siblings", "related")) -> DataFrame:
    """The full ``expand_related`` round-trip (nlp.py:343-362) over every
    refs field at once: (src, ref_field, score, <referred post row>) — the
    reference returns [(Post, stored-ref)] pairs per field; the engine
    returns the union with ``ref_field`` tagging which list the edge came
    from. Dangling refs drop out (inner join), matching the reference's
    next(filter(...), None) skip."""
    out = None
    for f_name in fields:
        part = expand_refs(posts, f_name).withColumn("ref_field", F.lit(f_name))
        out = part if out is None else out.unionByName(part)
    return out


def api_projection(posts: DataFrame, id_col: str = "post_id") -> DataFrame:
    """F6, the API-edge shape (``Post.asdict``, conf/post_item.py:74-78):
    the storage id column re-emitted as a STRING ``id`` and dropped —
    consumers never see the engine's 64-bit key, exactly as the reference
    hides Mongo's ``_id``."""
    return posts.withColumn("id", F.col(id_col).cast("string")).drop(id_col)
