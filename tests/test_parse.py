"""HTML parse stage (S2/S3/S4/S6): link extraction with section typing,
article facts, logo heuristic — stdlib parser, deterministic."""

from __future__ import annotations

import pytest

from scrapy_newsutils_spark.sources.parse import parse_page, parse_pages

HTML = """
<html><head>
<title>Harbor storm</title>
<meta property="og:image" content="/og.png">
<meta property="article:published_time" content="2024-03-02T10:00:00Z">
</head><body>
<nav class="topnav"><a href="/"><img src="/assets/site-logo.png"></a>
  <a href="/about">about</a></nav>
<div class="featured-zone">
  <a href="/post/featured-1">big story</a>
</div>
<article class="post-body">
  <h1>Harbor storm damages market</h1>
  <p>The storm hit the harbor.</p>
  <p>Damage was extensive.</p>
  <a href="/post/related-2">related story</a>
  <img src="/imgs/a.jpg"><img src="http://cdn.example.com/b.jpg">
</article>
<script>var x = "<p>not text</p>";</script>
</body></html>
"""


def test_parse_page_links_typed_by_section():
    d = parse_page(HTML, "https://news.example.com",
                   post_sections={"featured": "featured-zone",
                                  "default": "post-body"})
    by_type = {}
    for l in d["outlinks"]:
        by_type.setdefault(l["link_type"], []).append(l["url"])
    assert "https://news.example.com/post/featured-1" in by_type["featured"]
    assert "https://news.example.com/post/related-2" in by_type["default"]
    assert "https://news.example.com/about" in by_type[""]


def test_parse_page_article_facts():
    d = parse_page(HTML, "https://news.example.com")
    assert d["title"] == "Harbor storm"
    assert "The storm hit the harbor." in d["text"]
    assert "Damage was extensive." in d["text"]
    assert "not text" not in d["text"]  # script content skipped
    assert "https://news.example.com/imgs/a.jpg" in d["images"]
    assert d["top_image"] == "/og.png"  # og:image wins
    assert d["publish_time"] == "2024-03-02T10:00:00Z"


def test_logo_heuristic_cases():
    # case 1: src contains logo
    d = parse_page(HTML, "https://news.example.com")
    assert d["logo"] == "https://news.example.com/assets/site-logo.png"
    # case 2: homepage anchor wrapping an img
    h2 = '<a href="/"><img src="/brand/mark.png"></a>'
    assert parse_page(h2, "https://x.com")["logo"] == "https://x.com/brand/mark.png"
    # case 3: logo-ish alt
    h3 = '<img src="/m.png" alt="Site Logo">'
    assert parse_page(h3, "https://x.com")["logo"] == "https://x.com/m.png"
    # negative
    h4 = '<a href="/p/1"><img src="/photo.jpg" alt="storm"></a>'
    assert parse_page(h4, "https://x.com")["logo"] is None


def test_parse_page_malformed_html_never_raises():
    for bad in ["", "<div><a href=", "<<<>>>", None]:
        d = parse_page(bad, "https://x.com")
        assert isinstance(d["outlinks"], list)


def test_parse_pages_dataframe_stage(spark):
    df = spark.createDataFrame(
        [("https://news.example.com/p/1", HTML), ("https://y.com/p", "<p>tiny</p>")],
        "url string, html string",
    )
    out = parse_pages(df, post_sections={"default": "post-body"}).collect()
    rows = {r["url"]: r for r in out}
    assert rows["https://news.example.com/p/1"]["title"] == "Harbor storm"
    assert len(rows["https://news.example.com/p/1"]["outlinks"]) == 4
    assert rows["https://y.com/p"]["text"] == "tiny"


NLP_HTML = """
<html><head><title>Storm batters harbor</title>
<meta name="author" content="Ada Writer">
<meta property="article:published_time" content="2024-03-02T10:00:00Z">
</head><body>
<article class="post-body">
<p>The storm battered the harbor. The storm damage closed the harbor market.</p>
<p>Officials said repairs begin tomorrow. The weather was mild inland.</p>
<a rel="author" href="/staff/bob">Bob Byline</a>
<video src="/clips/storm.mp4"></video>
<iframe src="https://www.youtube.com/embed/abc123"></iframe>
<iframe src="https://ads.example.com/frame"></iframe>
</article>
</body></html>
"""


def test_parse_nlp_fields_keywords_excerpt():
    d = parse_page(NLP_HTML, "https://news.example.com")
    # keywords: top-tf tokens minus stopwords; 'storm' (3x) and 'harbor' (3x) lead
    assert d["keywords"][:2] == ["harbor", "storm"]  # tf tie → alpha order
    assert "the" not in d["keywords"]
    # excerpt: the keyword-heaviest sentences, in document order
    assert "The storm battered the harbor." in d["excerpt"]
    assert "mild inland" not in d["excerpt"]


def test_parse_authors_and_videos():
    d = parse_page(NLP_HTML, "https://news.example.com")
    names = [a["name"] for a in d["authors"]]
    assert names == ["Ada Writer", "Bob Byline"]
    assert all(a["profile_image"] == "" and a["role"] == "" for a in d["authors"])
    assert "https://news.example.com/clips/storm.mp4" in d["videos"]
    assert "https://www.youtube.com/embed/abc123" in d["videos"]
    assert not any("ads.example.com" in v for v in d["videos"])  # non-video iframe


def test_posts_from_parsed_carries_nlp_fields(spark):
    from pyspark.sql import functions as F
    from scrapy_newsutils_spark import schemas
    from scrapy_newsutils_spark.sources.parse import posts_from_parsed
    df = spark.createDataFrame(
        [("https://news.example.com/p/1", NLP_HTML)], "url string, html string")
    posts = posts_from_parsed(parse_pages(df), "https://news.example.com",
                              country="FR", post_type="featured",
                              auto_publish=False)
    assert [(f.name, f.dataType) for f in posts.schema.fields] == \
        [(f.name, f.dataType) for f in schemas.POSTS.fields]
    r = posts.first()
    assert r["short_link"] == "/p/1"
    assert r["keywords"][0] == "harbor"
    assert [a["name"] for a in r["authors"]] == ["Ada Writer", "Bob Byline"]
    assert r["videos"] and r["excerpt"]
    assert r["version"] == 1 and r["is_scrap"] is True and r["is_draft"] is True
    assert r["type"] == "featured" and r["country"] == "FR"
    assert r["link_hash"].startswith(__import__("hashlib").md5(b"/p/1").hexdigest()[:8])


def test_restrict_xpaths_typed_links():
    """Reference restrict_xpaths fidelity (spiders.py:44-58): real XPath
    configs type the links when lxml is available; otherwise the section
    fallback keeps working (exercised by every other parse test)."""
    pytest.importorskip("lxml")
    from scrapy_newsutils_spark.sources.parse import parse_page

    html = """<html><body>
      <div id="featured"><a href="/f/1">f1</a></div>
      <div class="story"><a href="/s/1">s1</a><a href="/s/2">s2</a></div>
      <nav><a href="/about">about</a></nav>
    </body></html>"""
    d = parse_page(html, "https://x.example.com",
                   restrict_xpaths={"featured": '//div[@id="featured"]//a/..',
                                    "default": '//div[@class="story"]'})
    types = {o["url"].rsplit("/", 2)[-2] + "/" + o["url"].rsplit("/", 1)[-1]:
             o["link_type"] for o in d["outlinks"]}
    assert types["f/1"] == "featured"
    assert types["s/1"] == "default" and types["s/2"] == "default"
    assert types["x.example.com/about"] == ""


def test_restrict_xpaths_falls_back_without_lxml(monkeypatch):
    """With lxml absent the XPath request degrades to the section-class
    approximation instead of crashing (container limitation path)."""
    from scrapy_newsutils_spark.sources import parse as P

    monkeypatch.setattr(P, "_lxml_etree", None)
    html = ('<div class="story"><a href="/s/1">s1</a></div>'
            '<nav><a href="/about">x</a></nav>')
    d = P.parse_page(html, "https://x.example.com",
                     post_sections={"default": "story"},
                     restrict_xpaths={"default": '//div[@class="story"]'})
    got = {o["url"]: o["link_type"] for o in d["outlinks"]}
    assert got["https://x.example.com/s/1"] == "default"
    assert got["https://x.example.com/about"] == ""
