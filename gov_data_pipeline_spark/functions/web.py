"""Crawl-side text surface: HTML -> text extraction and URL
normalization — the two operators between ``sources.http.fetch_urls``
(SURVEY R1) and the documents table that the reference leaves to
per-handler regexes (``handlers/belarus.py:58-68`` extracts hrefs but
never page text; URL canonicalization has no reference equivalent at
all, yet any frontier dedup needs it).

Everything is a chain of built-in string/regex column expressions —
codegen'd, no UDF, no Python on the hot path — and every rule is
mirrorable in DuckDB (RE2 and Java regex agree on the subset used:
``(?is)`` flags, non-greedy ``.*?``, character classes).

These are deliberately RULE-BASED extractors: deterministic, cheap,
cross-engine-provable. A DOM-accurate boilerplate remover (readability
etc.) would sit behind the Arrow-batched ``mapInPandas`` runtime like
the other heavy text models; the rule chain here is the 100 TB first
pass that feeds it.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Query parameters stripped during URL normalization: pure tracking
# state that changes the string but never the resource.
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|yclid|ref)="


def html_text_col(html: Column) -> Column:
    """Visible text of an HTML document as one whitespace-normalized
    string: script/style/comment blocks removed wholesale, tags
    stripped, the five ubiquitous entities decoded (``&amp;`` LAST so
    ``&amp;lt;`` decodes to the literal ``&lt;`` the author wrote,
    not to ``<``), whitespace collapsed.
    """
    # script and style as two rules, not one with a </\1> backreference:
    # RE2 (the DuckDB oracle's engine) has no backreferences
    t = F.regexp_replace(html, r"(?is)<script\b[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"<[^>]+>", " ")
    for ent, ch in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def html_title_col(html: Column) -> Column:
    """<title> content, entity-decoded and whitespace-normalized;
    empty string when the document has no title element."""
    t = F.regexp_extract(html, r"(?is)<title[^>]*>(.*?)</title>", 1)
    for ent, ch in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def url_normalize_col(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL for frontier/corpus
    dedup. Rules (each provable cross-engine):

    - scheme and host lowercased (path/query case is significant);
    - default port dropped (``:80`` for http, ``:443`` for https);
    - fragment dropped (never sent to the server);
    - tracking query params dropped (:data:`TRACKING_PARAM_RE`);
    - remaining query params SORTED (param order is almost never
      semantic; sorting makes equal resources string-equal);
    - empty path becomes ``/``.

    Non-http(s) or relative inputs pass through unchanged — a frontier
    filters those before normalization.
    """
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    auth = F.lower(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    auth = F.when(
        scheme == "http", F.regexp_replace(auth, r":80$", "")
    ).otherwise(
        F.when(scheme == "https", F.regexp_replace(auth, r":443$", "")).otherwise(auth)
    )
    path = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qs = F.regexp_extract(url, r"^[^#]*\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qpart = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    normalized = F.concat(scheme, F.lit("://"), auth, path, qpart)
    return F.when(scheme.isin("http", "https"), normalized).otherwise(url)
