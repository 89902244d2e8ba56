"""Image quality gate (F4/F5): size predicate + BRISQUE-style score filter.

Reference semantics (/root/reference/src/newsutils/pipelines.py:151-226):
per image, keep iff width ≥ 300 AND height ≥ 200 (F4, size from
PIL.Image.open) and brisque score ≤ 50 (F5); scoring errors keep the image
iff ``image_brisque_ignore_exception`` (default True,
/root/reference/src/newsutils/conf/posts.py:153-155); undecodable images
are silently dropped (pipelines.py:213-214).

Engine layout: the size predicate runs JVM-side on the materialized (w, h)
columns — zero decode cost, pushed to the scan. Only survivors pay the
decode+score pandas UDF (Arrow batches). This is the stage ordering the
reference gets wrong (it fetches/scores images for posts later dropped —
README.md:119-122); here the cheap predicate always runs first.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.images import brisque_score_stub, decode_image

MIN_W, MIN_H = 300, 200  # image_min_size (conf/posts.py:153)
MAX_BRISQUE = 50.0       # image_brisque_max_score (conf/posts.py:154)


def size_predicate(w: str = "w", h: str = "h") -> F.Column:
    return (F.col(w) >= MIN_W) & (F.col(h) >= MIN_H)


@F.pandas_udf(T.DoubleType())
def brisque_udf(data: pd.Series) -> pd.Series:  # pragma: no cover (executor)
    def score(b) -> float | None:
        if b is None:
            return None  # undecodable/missing → None → dropped downstream
        try:
            return float(brisque_score_stub(decode_image(bytes(b))))
        except Exception:
            return float("nan")  # scoring error ≠ undecodable (policy differs)

    return data.map(score)


def gate_images(images: DataFrame, ignore_exception: bool = True,
                bytes_col: str = "bytes") -> DataFrame:
    """Apply F4 then F5. Returns survivors with a ``brisque`` column.

    - None score (undecodable) → dropped silently (reference behaviour);
    - NaN score (scorer raised) → kept iff ignore_exception.
    """
    sized = images.where(size_predicate())
    scored = sized.withColumn("brisque", brisque_udf(F.col(bytes_col)))
    ok = scored.where(
        F.col("brisque").isNotNull()
        & (
            (F.col("brisque") <= MAX_BRISQUE)
            | (F.isnan("brisque") & F.lit(ignore_exception))
        )
    )
    return ok


def repack_post_images(exploded: DataFrame, post_id: str = "post_id",
                       url_col: str = "image_url") -> DataFrame:
    """Per-post repack after the per-image gate: surviving image URLs back
    into an array, first survivor as top_image (reference keeps list order —
    engine orders by the original array index column ``image_idx``)."""
    return (
        exploded.groupBy(post_id)
        .agg(
            F.sort_array(F.collect_list(F.struct("image_idx", url_col))).alias("_s"),
        )
        .select(
            post_id,
            F.transform("_s", lambda s: s[url_col]).alias("images"),
            F.element_at(F.transform("_s", lambda s: s[url_col]), 1).alias("top_image"),
        )
    )
