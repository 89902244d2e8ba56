"""HTML parse stage (S2/S3/S4/S6): link extraction with section typing,
article facts, logo heuristic — stdlib parser, deterministic."""

from __future__ import annotations

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
