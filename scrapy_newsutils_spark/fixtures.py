"""Deterministic synthetic fixtures (seed=42) per FIXTURES.md.

No network, no external data. Two generation styles:

- ``images``: per-row seeded numpy RNG inside ``mapInPandas`` — each row's
  pixels depend only on its index, so the table is identical under any
  partitioning or parallelism (local[8] == local[32] == a 1000-executor
  cluster). This is the distributed-generation pattern used at bench scale.
- ``frontier``/``url_seen``/``robots``: pure-Spark ``sequence`` + ``explode``
  + ``xxhash64`` — fully JVM-side, scales to 10^10 rows by changing one int.
- small corpora (posts, sport_events): driver-side pandas, few hundred rows.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import schemas
from .functions.images import encode_image, phash64

SEED = 42
BASE_TS = dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)

_WORDS = (
    "press wire photo city river market council storm match festival bridge "
    "harbor farm road health school court vote energy water trade art music "
    "film sport game score team coach player league season final"
).split()

_W_CHOICES = [64, 160, 300, 640, 1280]
_H_CHOICES = [48, 120, 200, 480, 720]


def caption_for(i: int) -> str:
    """Deterministic caption sentence for image i (pure function of i)."""
    rng = np.random.default_rng(SEED + i)
    words = [_WORDS[j] for j in rng.integers(0, len(_WORDS), size=6)]
    return f"img{i:08d}: " + " ".join(words) + "."


def pixels_for(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic pixels: gradient base + seeded noise. Every ~13th image
    is near-flat (fails the BRISQUE-style naturalness gate on purpose)."""
    rng = np.random.default_rng(SEED + i)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 255) // max(w - 1, 1) + (yy * 128) // max(h - 1, 1)) % 256
    if i % 13 == 0:
        noise = rng.integers(0, 2, size=(h, w, 3))
        img = (np.full((h, w, 3), 128) + noise) % 256
    else:
        noise = rng.integers(0, 64, size=(h, w, 3))
        img = (base[..., None] + noise) % 256
    return img.astype(np.uint8)


def dims_for(i: int, small: bool = False) -> tuple[int, int, str]:
    rng = np.random.default_rng(SEED * 7 + i)
    w_choices = _W_CHOICES[:2] if small else _W_CHOICES
    h_choices = _H_CHOICES[:2] if small else _H_CHOICES
    w = w_choices[int(rng.integers(0, len(w_choices)))]
    h = h_choices[int(rng.integers(0, len(h_choices)))]
    fmt = "png" if rng.integers(0, 2) == 0 else "jpeg"
    return w, h, fmt


def make_image_row(i: int, small: bool = False) -> dict:
    """``small=True``: bench-scale payloads (≤160px) so a 100k-fetch epoch's
    materialized bytes stay in executor memory at sandbox heap sizes."""
    w, h, fmt = dims_for(i, small=small)
    px = pixels_for(i, w, h)
    return {
        "image_id": f"img-{i:08d}",
        "bytes": encode_image(px, fmt),
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption_for(i),
        "phash": phash64(px),
    }


def images_table(spark: SparkSession, n: int = 2000, small: bool = False) -> DataFrame:
    """Distributed deterministic image generation (mapInPandas over range)."""

    def gen(batches):
        for pdf in batches:
            rows = [make_image_row(int(i), small=small) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return (
        spark.range(n)
        .repartition(max(spark.sparkContext.defaultParallelism, 4))
        .mapInPandas(gen, schema=schemas.IMAGES)
    )


# ---------------------------------------------------------------------------
# frontier / url_seen / robots — pure-Spark generation (scales by one int)

N_HOSTS = 200
HOT_HOSTS = ("hot0.example.com", "hot1.example.com")


def _host_expr(i):
    """Deterministic host for row i: 2 hot hosts own ~40% of rows (skew)."""
    return (
        F.when(i % 5 == 0, F.lit(HOT_HOSTS[0]))
        .when(i % 5 == 1, F.lit(HOT_HOSTS[1]))
        .otherwise(F.concat(F.lit("h"), F.pmod(F.xxhash64(i), F.lit(N_HOSTS - 2)),
                            F.lit(".example.com")))
    )


def frontier_table(spark: SparkSession, n: int = 2000, n_images: int = 2000) -> DataFrame:
    """Synthetic frontier per FIXTURES.md §2 — all JVM-side.

    url_surt/url_key here use the same formula the engine computes, so
    golden-pair tests verify the pandas-UDF canonicalizer against them.
    priority is a deterministic hash-derived double in [0,1); the first URL
    of each host is a seed (priority 1.0, depth 0).
    """
    i = F.col("id")
    host = _host_expr(i)
    df = (
        spark.range(n)
        .withColumn("host", host)
        .withColumn(
            "path",
            F.concat(
                F.when(F.pmod(i, F.lit(17)) == 3, F.lit("/private/")).otherwise(F.lit("/p/")),
                i.cast("string"),
            ),
        )
        .withColumn("url", F.concat(F.lit("https://"), F.col("host"), F.col("path")))
        .withColumn(
            "url_surt",
            F.concat(
                F.array_join(F.reverse(F.split(F.col("host"), r"\.")), ","),
                F.lit(")"),
                F.col("path"),
            ),
        )
        .withColumn("url_key", F.xxhash64("url_surt"))
    )
    # seed = the min-id URL of each host. A per-host row_number window would
    # sort a hot host's entire slice in one partition (40M rows at n=10^8 —
    # OOMs); a partial-agg min + broadcast join back is O(1) memory.
    min_ids = df.groupBy("host").agg(F.min("id").alias("_min_id"))
    df = (
        df.join(F.broadcast(min_ids), "host")
        .withColumn("is_seed", F.col("id") == F.col("_min_id"))
        .drop("_min_id")
        .withColumn(
            "priority",
            F.when(F.col("is_seed"), F.lit(1.0)).otherwise(
                F.pmod(F.xxhash64(F.col("url")), F.lit(1_000_000)) / 1_000_000.0
            ),
        )
        .withColumn("depth", F.when(F.col("is_seed"), 0).otherwise(
            (F.pmod(i, F.lit(5)) + 1).cast("int")))
        .withColumn(
            "discovered_ts",
            (F.lit(BASE_TS.replace(tzinfo=None)) + F.make_interval(secs=i.cast("double"))),
        )
        .withColumn(
            "image_id",
            F.when(F.pmod(i, F.lit(7)) != 6,
                   F.format_string("img-%08d", F.pmod(F.xxhash64(i + 1), F.lit(n_images)).cast("int")))
        )
        .withColumn("epoch_added", F.lit(0))
    )
    return df.select([f.name for f in schemas.FRONTIER.fields])


def url_seen_table(spark: SparkSession, frontier: DataFrame, buckets: int = 64,
                   fraction_mod: int = 10) -> DataFrame:
    """Pre-populate ~1/fraction_mod of frontier keys as already-seen
    (exercises the anti-join — reference seen-set semantics,
    /root/reference/src/newsutils/pipelines.py:74-95)."""
    return (
        frontier.where(F.pmod(F.col("url_key"), F.lit(fraction_mod)) == 0)
        .select(
            "url_key",
            "host",
            F.lit(0).alias("first_seen_epoch"),
            F.pmod(F.col("url_key"), F.lit(buckets)).cast("int").alias("bucket"),
        )
    )


def robots_table(spark: SparkSession) -> DataFrame:
    """Politeness config per host: delays {0,500,2000,60000}ms (the 60s
    extreme mirrors the e-zine 1-req/60s budget), a few /private disallows."""
    hosts = list(HOT_HOSTS) + [f"h{i}.example.com" for i in range(N_HOSTS - 2)]
    delays = [0, 500, 2000, 60000]
    rows = []
    for idx, h in enumerate(hosts):
        rng = np.random.default_rng(SEED * 3 + idx)
        rows.append(
            {
                "host": h,
                # hot hosts get 0 delay so skew tests stress throughput
                "crawl_delay_ms": 0 if h in HOT_HOSTS else delays[int(rng.integers(0, 4))],
                "disallow_prefixes": ["/private"] if idx % 11 == 0 else [],
                "max_concurrency": 16,
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows), schema=schemas.ROBOTS)


# ---------------------------------------------------------------------------
# posts corpus — exercises every reference pipeline branch (FIXTURES.md §5)

def posts_batch(spark: SparkSession) -> DataFrame:
    """A crawl batch with: in/out-of-window publish_times + nulls, duplicate
    short_link triples (pristine / major-edit / minor-edit), topic clusters
    for similarity, and pre-existing metapost rows."""
    rows: list[dict] = []
    day0 = BASE_TS.replace(tzinfo=None)

    def mk(i: int, **over) -> dict:
        short = over.pop("short_link", f"/post/{i}")
        base = {
            "post_id": i,
            "country": "gn",
            "link": f"https://paper{i % 3}.example.com{short}",
            "short_link": short,
            "link_hash": None,
            "type": "default" if i % 4 else "featured",
            "title": f"title {i} " + " ".join(_WORDS[(i * 3) % 20 : (i * 3) % 20 + 3]),
            "text": " ".join(_WORDS[(i * 5) % 25 : (i * 5) % 25 + 6]) + f" body {i}",
            "excerpt": "",
            "publish_time": day0 + dt.timedelta(days=i % 5, hours=i % 23),
            "modified_time": day0 + dt.timedelta(days=i % 5, hours=(i % 23) + 1),
            "top_image": f"https://img.example.com/{i}.png",
            "images": [f"https://img.example.com/{i}.png"],
            "videos": [],
            "keywords": [_WORDS[i % len(_WORDS)]],
            "tags": [],
            "authors": [{"name": f"author{i % 7}", "profile_image": None, "role": "writer"}],
            "paper": {"brand": f"paper{i % 3}", "description": "d", "logo_url": None},
            "version": 1,
            "is_draft": bool(i % 9 == 0),
            "is_scrap": False,
            "category": None,
            "caption": None,
            "summary": None,
            "siblings": [],
            "related": [],
            "created_ts": day0 + dt.timedelta(minutes=i),
        }
        base.update(over)
        return base

    for i in range(60):
        rows.append(mk(i))
    # out-of-window + null publish_time (FilterDate / validity branches)
    rows.append(mk(100, publish_time=day0 - dt.timedelta(days=40)))
    rows.append(mk(101, publish_time=None))
    # pre-existing metapost rows (metapost filter branch)
    rows.append(mk(102, type="metapost.default"))
    rows.append(mk(103, type="metapost.featured"))
    return spark.createDataFrame(pd.DataFrame(rows), schema=schemas.POSTS)


def sport_events_table(spark: SparkSession, n: int = 500) -> DataFrame:
    """E-zine corpus: 4-part compound key, ~5% duplicate keys with changed
    scores (upsert-overwrite check) — thesportsdb.py:633-695 semantics."""
    sports = ["Soccer", "Basketball", "Rugby"]
    rows = []
    for i in range(n):
        rng = np.random.default_rng(SEED * 11 + i)
        key_i = i if i % 20 != 19 else i - 1  # 5% duplicate compound keys
        rows.append(
            {
                "event_pk": 0,
                "idLeague": f"L{key_i % 9}",
                "idHomeTeam": f"T{key_i % 37}",
                "idAwayTeam": f"T{(key_i * 7) % 37}",
                "idEvent": f"E{key_i}",
                "strSport": sports[key_i % 3],
                "strEvent": f"match {key_i}",
                "intHomeScore": int(rng.integers(0, 6)),
                "intAwayScore": int(rng.integers(0, 6)),
                "dateEvent": (BASE_TS + dt.timedelta(days=key_i % 60)).date(),
            }
        )
    from . import conf

    df = conf.with_defaults(
        spark.createDataFrame(pd.DataFrame(rows)), schemas.SPORT_EVENTS)
    # deterministic id from the compound key (reference C8) — same
    # unit-separator join as ezines.event_pk (collision-proof concat)
    from .operators.ezines import KEY_SEP

    return df.withColumn(
        "event_pk",
        F.xxhash64(F.concat_ws(KEY_SEP, "idLeague", "idHomeTeam",
                               "idAwayTeam", "idEvent")),
    )


def ezine_api_table(spark: SparkSession,
                    league_ids: tuple = ("4328", "4335", "4346", "4387"),
                    season: str = "2024-2025",
                    events_per_league: int = 25) -> DataFrame:
    """Synthetic ``eventsseason.php`` response table: the sandbox stand-in
    for the thesportsdb HTTP API (a join replaces ``requests.get``, the same
    pattern as the images payload join). Deterministic full-45-field rows;
    ~1 in 5 events appears twice with a later dateEvent and bumped score —
    the upsert-overwrite case the reference replays via update_one."""
    from . import conf

    sports = {"4328": "Soccer", "4335": "Soccer", "4346": "Soccer",
              "4387": "Basketball"}
    rows = []
    for lid in league_ids:
        sport = sports.get(lid, "Soccer")
        for j in range(1, events_per_league + 1):
            ide = f"{lid}{j:03d}"
            base = {
                "idEvent": ide,
                "idLeague": lid,
                "idHomeTeam": f"T{(int(ide) * 3) % 20}",
                "idAwayTeam": f"T{(int(ide) * 5) % 20}",
                "strSport": sport,
                "strLeague": f"League {lid}",
                "strSeason": season,
                "strEvent": f"T{(int(ide) * 3) % 20} vs T{(int(ide) * 5) % 20}",
                "strHomeTeam": f"Team {(int(ide) * 3) % 20}",
                "strAwayTeam": f"Team {(int(ide) * 5) % 20}",
                "intHomeScore": (int(ide) * 7) % 6,
                "intAwayScore": (int(ide) * 11) % 6,
                "intRound": j,
                "strStatus": "Match Finished",
                "dateEvent": (BASE_TS + dt.timedelta(days=j)).date(),
            }
            rows.append(base)
            if j % 5 == 0:  # duplicate compound key, later correction
                rows.append({**base,
                             "intHomeScore": base["intHomeScore"] + 1,
                             "strStatus": "After Extra Time",
                             "dateEvent": base["dateEvent"] + dt.timedelta(days=1)})
    api_schema = T.StructType([f for f in schemas.SPORT_EVENTS.fields
                               if f.name != "event_pk"])
    return conf.with_defaults(spark.createDataFrame(pd.DataFrame(rows)),
                              api_schema)


def html_payload_table(spark: SparkSession, n: int, links_per_page: int = 3,
                       n_link_hosts: int = 40) -> DataFrame:
    """IMAGES-schema payload table whose bytes are HTML pages (fmt='html')
    — the parse-driven-discovery bench world. All JVM-side Column
    expressions (scales like ``frontier_table``); page i carries
    ``links_per_page`` deterministic absolute outlinks inside the
    ``story`` section the S2 extractor reads."""
    i = F.col("id")
    links = F.concat(*[
        F.format_string(
            f'<a href="https://h%d.example.com/d/%dx{j}">l</a>',
            F.pmod(i * (2 * j + 1) + j, F.lit(n_link_hosts)).cast("int"),
            i.cast("int"))
        for j in range(links_per_page)
    ])
    html = F.concat(F.lit('<html><body><div class="story"><p>page</p>'),
                    links, F.lit("</div></body></html>"))
    return spark.range(n).select(
        F.format_string("img-%08d", i.cast("int")).alias("image_id"),
        F.encode(html, "UTF-8").alias("bytes"),
        F.lit(None).cast("int").alias("w"),
        F.lit(None).cast("int").alias("h"),
        F.lit("html").alias("fmt"),
        F.format_string("caption %d", i).alias("caption"),
        i.alias("phash"),
    )


def clustered_embeddings(spark: SparkSession, n: int, dim: int = 64,
                         n_labels: int = 256, noise: float = 0.15,
                         seed: int = SEED) -> DataFrame:
    """Deterministic clustered unit vectors at bench scale: row i =
    normalize(center[i % n_labels] + noise·sin-field(i)). Generated
    DISTRIBUTED (mapInPandas over ``spark.range``) and each row depends
    only on its id, so the table is identical under any parallelism —
    the pattern the 100-TB embedding tables would use. Cluster structure
    makes IVF/LSH recall meaningful (uniform random vectors have no
    neighbors to find)."""
    centers = np.random.default_rng(seed).standard_normal((n_labels, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    out_schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ])
    nl, d, amp = n_labels, dim, noise

    def gen(batches):
        j = np.arange(d)
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            lab = (ids % nl).astype(np.int32)
            # sin field: smooth deterministic per-(id, component) noise
            phase = (0.7 * ids[:, None] + 1.3 * j[None, :]
                     + 0.0013 * ids[:, None] * j[None, :])
            v = centers[lab] + amp * np.sin(phase)
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            yield pd.DataFrame({
                "vec_id": ids,
                "embedding": list(v.astype(np.float32)),
                "label": lab,
            })

    return spark.range(n).mapInPandas(gen, out_schema)


def html_pages_from_docs(docs: DataFrame, m: int,
                         source_url: str = "https://news.example.com") -> DataFrame:
    """Deterministic synthetic HTML pages (url, html) from a ``documents``
    frame — the S2/S3 composition input. Pure Column expressions (no
    per-row Python): page N carries title 'Doc N', the doc's text in a
    ``story`` section, two typed article links + one nav link, one body
    image, an og:image, an author meta, and an article:published_time on a
    5-day cycle — every fact the parse stage extracts is a closed-form
    function of doc_id, so a SQL oracle can reconstruct the composition's
    output without parsing (driver query ``crawl_compose_stats``)."""
    i = F.col("doc_id")
    pub = F.format_string("2024-03-%02dT08:00:00",
                          (i % 5 + 1).cast("int"))
    html = F.concat(
        F.lit("<html><head><title>"), F.format_string("Doc %d", i),
        F.lit("</title><meta property=\"article:published_time\" content=\""),
        pub, F.lit("\"/>"),
        F.format_string(
            "<meta property=\"og:image\" content=\"%s/og/%d.png\"/>",
            F.lit(source_url), i),
        F.format_string("<meta name=\"author\" content=\"Author %d\"/>",
                        (i % 7).cast("int")),
        F.lit("</head><body><div class=\"story\"><p>"), F.col("text"),
        F.lit("</p>"),
        F.format_string("<a href=\"/post/%d\">next</a>", (i + 1) % m),
        F.format_string("<a href=\"/post/%d\">rel</a>", (i * 3 + 1) % m),
        F.lit("</div><nav><a href=\"/about\">about</a></nav>"),
        F.format_string("<img src=\"/img/%d.png\"/>", i),
        F.lit("</body></html>"),
    )
    return docs.where(i < m).select(
        F.format_string(f"{source_url}/post/%d", i).alias("url"),
        html.alias("html"),
    )
