"""Image payload invariants (BASELINE.json input_hint): PNG round-trips
byte-exactly; the deterministic lossy codec reconstructs at PSNR >= 40 dB;
captions are exact; phash is a pure function of pixels.
"""

from __future__ import annotations

import numpy as np
import pytest

from scrapy_newsutils_spark import fixtures
from scrapy_newsutils_spark.functions import images as I


def _img(i):
    w, h, fmt = fixtures.dims_for(i)
    return fixtures.pixels_for(i, w, h), fmt


@pytest.mark.parametrize("i", [0, 1, 13, 27, 99])
def test_png_lossless_roundtrip(i):
    px, _ = _img(i)
    assert np.array_equal(I.decode_png(I.encode_png(px)), px)


@pytest.mark.parametrize("i", [2, 5, 26, 77])
def test_lossy_psnr_at_least_40db(i):
    px, _ = _img(i)
    rec = I.decode_jpeg(I.encode_jpeg(px))
    assert I.psnr(px, rec) >= 40.0


def test_decode_dispatch_on_magic():
    px, _ = _img(3)
    assert np.array_equal(I.decode_image(I.encode_png(px)), px)
    assert I.decode_image(I.encode_jpeg(px)).shape == px.shape
    with pytest.raises(ValueError):
        I.decode_image(b"garbage")


def test_phash_deterministic_and_distinct():
    a, _ = _img(4)       # gradient+noise
    b = fixtures.pixels_for(13, 300, 200)  # near-flat — different structure
    assert I.phash64(a) == I.phash64(a)
    assert I.phash64(a) != I.phash64(b)
    assert -(2**63) <= I.phash64(a) < 2**63


def test_brisque_stub_separates_flat_from_textured():
    # fixture makes every 13th image near-flat → unnatural → score > 50
    flat = fixtures.pixels_for(13, 300, 200)
    textured = fixtures.pixels_for(14, 300, 200)
    assert I.brisque_score_stub(flat) > 50.0
    assert I.brisque_score_stub(textured) <= 50.0


def test_images_table_deterministic_across_parallelism(spark):
    """Same rows regardless of partitioning (distributed-generation
    invariant: row content is a pure function of row index)."""
    a = {r["image_id"]: (r["phash"], r["caption"], len(r["bytes"]))
         for r in fixtures.images_table(spark, n=40).collect()}
    b = {r["image_id"]: (r["phash"], r["caption"], len(r["bytes"]))
         for r in fixtures.images_table(spark, n=40).coalesce(1).collect()}
    assert a == b


def test_fixture_phash_matches_pixels(images_df):
    rows = images_df.limit(10).collect()
    for r in rows:
        px = I.decode_image(bytes(r["bytes"]))
        assert I.phash64(px) == r["phash"], r["image_id"]
        assert px.shape == (r["h"], r["w"], 3)
