"""URL canonicalization (RFC 3986 normalize + SURT) and key derivation.

The reference derives its dedup key as ``short_link = url - source_url``
(/root/reference/src/newsutils/crawl/spiders.py:106,115-116) and
``link_hash = md5(short_link) + '.' + epoch``
(/root/reference/src/newsutils/nlp.py:292-294). The engine canonicalizes
first (RFC 3986 + SURT, per the north rule) and keys on
``url_key = xxhash64(url_surt)`` so the key is stable across syntactic URL
variants and cheap to shuffle/partition on at 10^10-URL scale.

Canonicalization is string-wrangling Python — it runs ONLY inside Arrow-
batched pandas UDFs (never row-at-a-time ``F.udf``). Simple derivations
(host extraction, short_link, link_hash) stay JVM-side as Column exprs.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, quote, unquote, urlencode, urlsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DEFAULT_PORTS = {"http": "80", "https": "443"}
# session-noise query params dropped during canonicalization (Heritrix-style)
_STRIP_PARAMS = {"utm_source", "utm_medium", "utm_campaign", "utm_term",
                 "utm_content", "fbclid", "gclid", "sessionid", "phpsessid",
                 "jsessionid", "sid"}


def canonicalize_url(url: str) -> str:
    """RFC 3986 normalization of a single URL (pure function).

    lowercase scheme+host, strip default port & fragment & www. prefix,
    collapse dot-segments, re-encode the path minimally, drop session
    params, sort the query string. Returns "" for unparseable input.
    """
    if not url:
        return ""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return ""
    scheme = (parts.scheme or "http").lower()
    host = (parts.hostname or "").lower().rstrip(".")
    if not host:
        return ""
    if host.startswith("www.") and host.count(".") >= 2:
        host = host[4:]
    port = ""
    if parts.port is not None and str(parts.port) != _DEFAULT_PORTS.get(scheme, ""):
        port = f":{parts.port}"

    # path: percent-decode then re-encode uniformly; collapse dot-segments
    raw_path = parts.path or "/"
    segs: list[str] = []
    for seg in raw_path.split("/"):
        if seg == "." or seg == "":
            continue
        if seg == "..":
            if segs:
                segs.pop()
            continue
        segs.append(quote(unquote(seg), safe="~!$&'()*+,;=:@-._"))
    path = "/" + "/".join(segs)
    if raw_path.endswith("/") and path != "/":
        path += "/"

    query = ""
    if parts.query:
        kept = sorted(
            (k, v) for k, v in parse_qsl(parts.query, keep_blank_values=True)
            if k.lower() not in _STRIP_PARAMS
        )
        query = urlencode(kept)

    out = f"{scheme}://{host}{port}{path}"
    if query:
        out += f"?{query}"
    return out


def surt(url: str) -> str:
    """SURT (Sort-friendly URI Reordering Transform) of a canonical URL.

    ``https://news.example.com/a/b?q=1`` → ``com,example,news)/a/b?q=1``.
    Scheme is dropped (http/https collapse — the reference's seen-set also
    ignores scheme because short_link strips the source prefix).
    """
    canon = canonicalize_url(url)
    if not canon:
        return ""
    parts = urlsplit(canon)
    host = parts.hostname or ""
    port = f":{parts.port}" if parts.port else ""
    rev = ",".join(reversed(host.split(".")))
    out = f"{rev}{port}){parts.path}"
    if parts.query:
        out += f"?{parts.query}"
    return out


@F.pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:  # pragma: no cover (runs on executor)
    return urls.map(lambda u: canonicalize_url(u) if u is not None else None)


@F.pandas_udf(T.StringType())
def surt_udf(urls: pd.Series) -> pd.Series:  # pragma: no cover (runs on executor)
    return urls.map(lambda u: surt(u) if u is not None else None)


# ---------------------------------------------------------------------------
# JVM-side Column helpers (no Python in the hot path)

def host_of(url: Column) -> Column:
    """Extract lowercase host (Spark builtin ``parse_url`` — JVM-side)."""
    return F.lower(F.parse_url(url, F.lit("HOST")))


def url_key_of(url_surt: Column) -> Column:
    """The engine's 64-bit dedup/join key (input_hint: xxhash64-based)."""
    return F.xxhash64(url_surt)


def with_url_identity(df, url_col: str = "url"):
    """Attach url_surt / url_key / host columns to a DataFrame of URLs."""
    return (
        df.withColumn("url_surt", surt_udf(F.col(url_col)))
        .withColumn("url_key", url_key_of(F.col("url_surt")))
        .withColumn("host", host_of(F.col(url_col)))
    )


def short_link(link: Column, source_url: Column) -> Column:
    """Reference semantics: short_link = url minus the source prefix
    (/root/reference/src/newsutils/crawl/spiders.py:106)."""
    return F.replace(link, source_url, F.lit(""))


def link_hash(short: Column, ts: Column) -> Column:
    """Reference semantics: md5(short_link) + '.' + epoch-seconds
    (/root/reference/src/newsutils/nlp.py:292-294)."""
    return F.concat(F.md5(short), F.lit("."), F.unix_timestamp(ts).cast("string"))
