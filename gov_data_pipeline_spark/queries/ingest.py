"""Document-ingest queries (SURVEY R4-R8, R18-R19, T14): the
workbook/DOCX extraction surface and the zipWithIndex ingest indexer,
oracle-checked end-to-end.

The fixtures carry no binary documents, so each query *builds* its
document deterministically from fixture rows inside the query (the
same synthesize-inside-the-query pattern as textops), runs the real
codec path — zip container, drawing anchors, PNG encode/decode, OOXML
tables — and lands back on values a DuckDB oracle states directly from
``documents``. The workbook/docx construction uses only doc_id < K
rows, which exist identically at every fixture scale, so the embedded
images (and therefore the oracle's expected data URIs, computed once
at import from the same codec) are scale-independent.
"""

from __future__ import annotations

import base64

from pyspark.sql import DataFrame, SparkSession, functions as F

from gov_data_pipeline_spark.catalog import read_table as _t
from gov_data_pipeline_spark.sources.png_codec import solid_png

# ---------------------------------------------------------------------------
# q81 — xlsx embedded-image extraction (reference handlers/base.py:200-274):
# workbook bytes -> anchored images -> data-URI column joined by row_idx.
# ---------------------------------------------------------------------------

_Q81_DOCS = 24  # doc_id < 24 rows become sheet rows — present at every sf


def _q81_rgb(d: int) -> tuple[int, int, int]:
    return (d % 256, (d * 3) % 256, (d * 7) % 256)


def _q81_rgb2(d: int) -> tuple[int, int, int]:
    return ((d + 31) % 256, (d * 5) % 256, (d * 11) % 256)


def _q81_expected_uri(d: int) -> str:
    """The data URI(s) q81 must extract for doc ``d`` — computed from
    the same PNG encoder the workbook embeds, so the oracle literal and
    the extracted value agree byte-for-byte."""
    uri = "data:image/png;base64," + base64.b64encode(
        solid_png(3, 2, _q81_rgb(d))
    ).decode("ascii")
    if d % 8 == 0:
        uri2 = "data:image/png;base64," + base64.b64encode(
            solid_png(2, 2, _q81_rgb2(d))
        ).decode("ascii")
        return f"{uri} {uri2}"
    return uri


def q81_xlsx_image_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a workbook from the first 24 documents rows with PNGs
    anchored at every 4th data row (two images on every 8th, and the
    hanging-anchor ``rowOff > 10000`` form on the others), then run the
    full extraction loop: ``read_excel`` -> ``promote_headers`` ->
    ``extract_xlsx_images`` -> ``attach_images``. Everything crosses
    the real stdlib codec (zip, SpreadsheetML, drawing XML, PNG)."""
    from gov_data_pipeline_spark.sources.documents import (
        attach_images,
        extract_xlsx_images,
        images_to_df,
    )
    from gov_data_pipeline_spark.sources.excel import read_excel
    from gov_data_pipeline_spark.sources.xlsx_zip import write_xlsx
    from gov_data_pipeline_spark.transforms.headers import promote_headers

    docs = sorted(
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _Q81_DOCS)
        .select("doc_id", "text")
        .collect()
    )
    rows: list[list[str | None]] = [["id", "title"]]
    images: list[tuple[int, int, int, bytes]] = []
    for p, (d, text) in enumerate(docs):
        # NULL text flows through as a None cell (the codec supports
        # them) rather than crashing the driver-side fixture build
        rows.append([str(d), None if text is None else text[:20]])
        if d % 4 != 0:
            continue
        png = solid_png(3, 2, _q81_rgb(d))
        if d % 8 == 0:
            # plain anchor at the data row itself (+ a second image on
            # the same row — extraction space-joins them in order)
            images.append((p + 1, 2, 0, png))
            images.append((p + 1, 3, 0, solid_png(2, 2, _q81_rgb2(d))))
        else:
            # anchored to the row ABOVE but hanging >10000 EMU below its
            # top — the reference's next-row heuristic must fire
            images.append((p, 2, 20000, png))
    wb = write_xlsx(rows, images=images)

    df = read_excel(spark, wb, skip_rows=0)
    df = promote_headers(df, "row_idx", skip_rows=1)
    imgs = images_to_df(
        spark, extract_xlsx_images(wb, skip_rows=0), image_col="image_uri"
    )
    return (
        attach_images(df, imgs, image_col="image_uri")
        .select("row_idx", "id", "title", "image_uri")
        .orderBy("row_idx")
    )


_Q81_URI_CASE = " ".join(
    f"WHEN {d} THEN '{_q81_expected_uri(d)}'"
    for d in range(0, _Q81_DOCS, 4)
)

_Q81_SQL = f"""
WITH d AS (
  SELECT doc_id, substr(text, 1, 20) AS title,
         row_number() OVER (ORDER BY doc_id) AS rn
  FROM documents WHERE doc_id < {_Q81_DOCS})
SELECT rn AS row_idx,
       CAST(doc_id AS VARCHAR) AS id,
       title,
       CASE WHEN doc_id % 4 = 0
            THEN CASE doc_id {_Q81_URI_CASE} END
            ELSE '' END AS image_uri
FROM d
ORDER BY row_idx
"""


# ---------------------------------------------------------------------------
# q82 — DOCX table ingest (reference handlers/kyrgyzstan.py:239-270):
# docx bytes -> tables -> assemble_rows -> continuation-row merge.
# ---------------------------------------------------------------------------

_Q82_DOCS = 30


def q82_docx_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a registry-shaped DOCX table from the first 30 documents
    rows (every 4th row starts a record, 'Name:' noise rows are
    dropped, the rest merge into the previous record), round-trip it
    through the stdlib OOXML codec, and run the reference's assembly:
    ``docx_tables`` -> ``assemble_rows`` -> ``merge_continuation_rows``."""
    from gov_data_pipeline_spark.sources.docx_zip import write_docx_table
    from gov_data_pipeline_spark.sources.documents import assemble_rows, docx_tables
    from gov_data_pipeline_spark.transforms import merge_continuation_rows

    docs = sorted(
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _Q82_DOCS)
        .select("doc_id", "text")
        .collect()
    )
    rows: list[list[str]] = [["reg", "payload"]]
    for d, text in docs:
        if d % 4 == 0:
            reg = f"№{1000 + d}/ТЗ"
        elif d % 8 == 2:
            reg = "Name: шум"
        elif d % 4 == 3:
            reg = ""
        else:
            reg = "продолжение записи"
        rows.append([reg, None if text is None else text[:12]])
    docx = write_docx_table(rows)

    tables = docx_tables(docx)
    df = assemble_rows(spark, tables[0], skip_rows=1, idx_col="row_idx")
    return merge_continuation_rows(df, key_col="reg", idx_col="row_idx").orderBy(
        "row_idx"
    )


# assemble_rows row_idx counts ALL table rows (header = 0), so data row
# for the p-th doc is p+1 = row_number() over doc_id order. DOCX cell
# text is stripped by the codec; the fixture texts carry no control
# characters, so trim() mirrors Python's strip() here.
_Q82_SQL = f"""
WITH base AS (
  SELECT row_number() OVER (ORDER BY doc_id) AS row_idx,
         CASE WHEN doc_id % 4 = 0 THEN '№' || CAST(doc_id + 1000 AS VARCHAR) || '/ТЗ'
              WHEN doc_id % 8 = 2 THEN 'Name: шум'
              WHEN doc_id % 4 = 3 THEN ''
              ELSE 'продолжение записи' END AS reg,
         trim(substr(text, 1, 12)) AS payload
  FROM documents WHERE doc_id < {_Q82_DOCS}),
kept AS (
  SELECT * FROM base WHERE NOT starts_with(trim(reg), 'Name:')),
flagged AS (
  SELECT *,
         sum(CASE WHEN regexp_matches(trim(reg), '^(№?\\d{{4,}})(/ТЗ.*)?') THEN 1 ELSE 0 END)
           OVER (ORDER BY row_idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
  FROM kept)
SELECT min(row_idx) AS row_idx,
       coalesce(string_agg(nullif(trim(reg), ''), ' ' ORDER BY row_idx), '') AS reg,
       coalesce(string_agg(nullif(trim(payload), ''), ' ' ORDER BY row_idx), '') AS payload
FROM flagged
GROUP BY gid
ORDER BY row_idx
"""


# ---------------------------------------------------------------------------
# q83 — zipWithIndex-at-ingest row indexing (T14's scale path): the
# global-window funnel in q18 replaced by range-partition + sort +
# per-partition offsets.
# ---------------------------------------------------------------------------


def q83_row_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_data_pipeline_spark.operators.relational import attach_row_index_ingest

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        attach_row_index_ingest(docs, order_by=["doc_id"])
        .select("doc_id", "lang", "row_idx")
        .orderBy("doc_id")
    )


_Q83_SQL = """
SELECT doc_id, lang,
       row_number() OVER (ORDER BY doc_id) - 1 AS row_idx
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q129 — HTML -> text/title extraction (crawl ingest: the step between
# R1's fetch_urls and the documents table). Synthesize-inside-the-query:
# each document is wrapped in a full HTML page with a styled head, a
# script block containing '<' and a fake close tag, a comment, and
# entity-escaped body text — then the rule-chain extractor must recover
# EXACTLY the title/body the oracle states directly from the raw
# columns (ground truth is engine-independent, not a mirrored regex).
# ---------------------------------------------------------------------------


def q129_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_data_pipeline_spark.functions.web import (
        html_text_col,
        html_title_col,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    html = F.concat(
        F.lit("<html><head><title> "),
        F.col("source"),
        F.lit(" &amp; page "),
        F.col("doc_id").cast("string"),
        F.lit("</title><style>p { color: red; }</style></head><body>"),
        F.lit('<script type="text/javascript">var x = 1 < 2 && "</div>";</script>'),
        F.lit("<!-- boilerplate\n nav -->"),
        F.lit("<h1 class='hd'>"),
        F.upper(F.col("source")),
        F.lit("</h1>\n<p>"),
        F.col("text"),
        F.lit("</p><p>&lt;escaped&gt; &quot;q&quot; &#39;s&nbsp;end</p>"),
        F.lit("</body></html>"),
    )
    page = docs.select("doc_id", html.alias("__html"))
    return page.select(
        "doc_id",
        html_title_col(F.col("__html")).alias("title"),
        html_text_col(F.col("__html")).alias("text"),
    ).orderBy("doc_id")


_Q129_SQL = r"""
SELECT doc_id,
       source || ' & page ' || CAST(doc_id AS VARCHAR) AS title,
       source || ' & page ' || CAST(doc_id AS VARCHAR) || ' '
         || upper(source) || ' '
         || trim(regexp_replace(text, '\s+', ' ', 'g'))
         || ' <escaped> "q" ''s end' AS text
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q130 — URL canonicalization for frontier/corpus dedup: scheme+host
# lowercased, default port and fragment dropped, tracking params
# stripped, surviving params sorted. The oracle states the expected
# canonical string directly from the raw columns.
# ---------------------------------------------------------------------------


def q130_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_data_pipeline_spark.functions.web import url_normalize_col

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    messy = F.concat(
        F.lit("HTTP://Registry."),
        F.upper(F.col("source")),
        F.lit(".Example.GOV:80/Files/Doc-"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=feed&b=2&a=1"))
        .when(F.col("doc_id") % 3 == 1, F.lit("?z=9&gclid=xyz&a=1#sec-2"))
        .otherwise(F.lit("#top")),
    )
    return (
        docs.select("doc_id", messy.alias("url"))
        .select("doc_id", "url", url_normalize_col(F.col("url")).alias("url_norm"))
        .orderBy("doc_id")
    )


_Q130_SQL = """
SELECT doc_id,
       'HTTP://Registry.' || upper(source) || '.Example.GOV:80/Files/Doc-'
         || CAST(doc_id AS VARCHAR)
         || CASE doc_id % 3 WHEN 0 THEN '?utm_source=feed&b=2&a=1'
                            WHEN 1 THEN '?z=9&gclid=xyz&a=1#sec-2'
                            ELSE '#top' END AS url,
       'http://registry.' || source || '.example.gov/Files/Doc-'
         || CAST(doc_id AS VARCHAR)
         || CASE doc_id % 3 WHEN 0 THEN '?a=1&b=2'
                            WHEN 1 THEN '?a=1&z=9'
                            ELSE '' END AS url_norm
FROM documents
ORDER BY doc_id
"""




# ---------------------------------------------------------------------------
# q131 — fixed-point PageRank over a deterministic link graph (crawl
# frontier prioritization — the authority score any registry crawler
# ranks its frontier by). Graph synthesized from documents: each doc
# links to 3 quadratic neighbors mod N ((id² + 17j + 7) mod N — the
# squaring is non-bijective, so in-degrees are genuinely skewed and a
# uniform-rank bug cannot pass), and the structure exists identically
# at every SF. INTEGER fixed-point (scale 1e12, d=0.85,
# 4 iterations): floating PageRank sums are partition-order-sensitive;
# the fixed-point form is bit-identical across engines and retries,
# which is what lets the oracle unroll the same 4 iterations in SQL
# and hash-match exactly. See operators/graph.pagerank.
# ---------------------------------------------------------------------------


def q131_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_data_pipeline_spark.operators.graph import pagerank

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    link = F.explode(
        F.array(*[F.lit(j) for j in (0, 1, 2)])
    ).alias("j")
    # reduce mod N BEFORE squaring: ids are arbitrary longs in a real
    # corpus (the x10 scaled fixture shifts them by k*1e9) and id**2
    # overflows int64 past ~3e9 — (id % N)**2 is bounded by N**2 and
    # identical on contiguous-id fixtures (id % N == id there)
    rid = F.col("doc_id") % n
    edges = docs.select("doc_id", link).select(
        F.col("doc_id").alias("src"),
        ((rid * rid + F.col("j") * 17 + 7) % n).alias("dst"),
    )
    return (
        pagerank(
            edges,
            docs,
            id_col="doc_id",
            iterations=4,
            damping=0.85,
            fixed_point_scale=10**12,
        )
        .orderBy("doc_id")
    )


def _pagerank_sql(
    edges_sql: str | None = None,
    conserve_mass: bool = False,
    iterations: int = 4,
    scale: int = 10**12,
) -> str:
    """Unroll the identical fixed-point iterations as chained CTEs —
    ONE builder for both the dropped-mass (q131) and conserved-mass
    (q137) oracles, so the shared arithmetic (init, contribution
    ``r // deg``, damping ``(85·inflow) // 100``) can never
    desynchronize between them. ``conserve_mass`` adds a per-iteration
    dangling-sum CTE whose ``dsum // n`` share joins the inflow —
    mirroring ``operators/graph.pagerank`` term for term."""
    if edges_sql is None:
        edges_sql = """
  SELECT doc_id AS src,
         ((doc_id % nn.n) * (doc_id % nn.n) + j * 17 + 7) % nn.n AS dst
  FROM documents CROSS JOIN nn
  CROSS JOIN (VALUES (0), (1), (2)) t(j)"""
    head = f"""
WITH nn AS (SELECT count(*) AS n FROM documents),
nodes AS (SELECT doc_id FROM documents),
edges AS ({edges_sql}),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
dang AS (SELECT doc_id FROM nodes
         WHERE doc_id NOT IN (SELECT src FROM deg)),
r0 AS (SELECT doc_id, CAST({scale} // nn.n AS BIGINT) AS r
       FROM documents CROSS JOIN nn)"""
    its = []
    prev = "r0"
    for i in range(1, iterations + 1):
        if conserve_mass:
            dsum_cte = f"""
ds{i} AS (SELECT coalesce(sum(p.r), 0) AS dsum
          FROM {prev} p JOIN dang g ON g.doc_id = p.doc_id),"""
            dsum_join = f" CROSS JOIN ds{i}"
            inflow = f"(coalesce(c.s, 0) + ds{i}.dsum // nn.n)"
        else:
            dsum_cte = ""
            dsum_join = ""
            inflow = "coalesce(c.s, 0)"
        its.append(f""",{dsum_cte}
it{i} AS (
  SELECT nd.doc_id,
         CAST((15 * ({scale} // nn.n)) // 100
              + (85 * {inflow}) // 100 AS BIGINT) AS r
  FROM nodes nd CROSS JOIN nn{dsum_join}
  LEFT JOIN (
    SELECT e.dst, sum(p.r // d.deg) AS s
    FROM edges e
    JOIN {prev} p ON p.doc_id = e.src
    JOIN deg d ON d.src = e.src
    GROUP BY e.dst) c ON c.dst = nd.doc_id)""")
        prev = f"it{i}"
    tail = f"""
SELECT doc_id, r AS rank FROM {prev} ORDER BY doc_id
"""
    return head + "".join(its) + tail


_Q131_SQL = _pagerank_sql()


# ---------------------------------------------------------------------------
# q137 — PageRank with CONSERVED dangling mass (operators/graph.pagerank
# conserve_mass=True): half the nodes have no out-edges, and their rank
# mass is redistributed uniformly each iteration instead of dropped —
# the mode whose score MAGNITUDES are usable as mixture weights.
# Fixed-point integer arithmetic end-to-end, so the oracle unrolls the
# same iterations (plus the per-iteration dangling-sum CTE) and
# hash-matches exactly; the dangling share uses the same integer
# division on both sides (all ranks positive, so DuckDB's floor //
# equals Spark's truncating div).
# ---------------------------------------------------------------------------


def q137_pagerank_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_data_pipeline_spark.operators.graph import pagerank

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    link = F.explode(F.array(*[F.lit(j) for j in (0, 1)])).alias("j")
    rid = F.col("doc_id") % n
    # only even ids emit links; odd ids dangle (≈ half the mass each
    # iteration flows through the dangling redistribution)
    edges = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", link)
        .select(
            F.col("doc_id").alias("src"),
            ((rid * rid + F.col("j") * 31 + 3) % n).alias("dst"),
        )
    )
    return (
        pagerank(
            edges,
            docs,
            id_col="doc_id",
            iterations=4,
            damping=0.85,
            fixed_point_scale=10**12,
            conserve_mass=True,
        )
        .orderBy("doc_id")
    )


_Q137_EDGES_SQL = """
  SELECT doc_id AS src,
         ((doc_id % nn.n) * (doc_id % nn.n) + j * 31 + 3) % nn.n AS dst
  FROM documents CROSS JOIN nn
  CROSS JOIN (VALUES (0), (1)) t(j)
  WHERE doc_id % 2 = 0"""

_Q137_SQL = _pagerank_sql(edges_sql=_Q137_EDGES_SQL, conserve_mass=True)


# ---------------------------------------------------------------------------
# q132 — sitemap ingestion: per-source sitemap XML (built from that
# source's documents, entity-escaped query strings) -> ordered <loc>
# frontier rows. The oracle states each source's URL list directly.
# ---------------------------------------------------------------------------


def q132_sitemap_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_data_pipeline_spark.functions.web import sitemap_locs_col

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    entry = F.concat(
        F.lit("<url><loc> https://"),
        F.col("source"),
        F.lit(".example.gov/doc?id="),
        F.col("doc_id").cast("string"),
        F.lit("&amp;v=1 </loc></url>"),
    )
    sitemaps = docs.groupBy("source").agg(
        F.concat(
            F.lit('<?xml version="1.0"?><urlset>'),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", entry.alias("e")))
                    ),
                    lambda s: s["e"],
                ),
                "",
            ),
            F.lit("</urlset>"),
        ).alias("__xml")
    )
    return (
        sitemaps.select(
            "source",
            F.posexplode(sitemap_locs_col(F.col("__xml"))).alias("pos", "loc"),
        )
        .orderBy("source", "pos")
    )


_Q132_SQL = """
SELECT source,
       CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS INT) AS pos,
       'https://' || source || '.example.gov/doc?id='
         || CAST(doc_id AS VARCHAR) || '&v=1' AS loc
FROM documents
ORDER BY source, pos
"""


# ---------------------------------------------------------------------------
# q133 — robots.txt crawl gate: per-source robots documents (group
# semantics, specific-agent precedence, longest-prefix match with the
# RFC 9309 allow tie-break) evaluated against each document's URL
# path. The oracle computes the verdict from the CONSTRUCTION rules,
# not from a mirrored parser — so a parsing bug on either layer
# (grouping, precedence, longest-match) breaks the hash.
# ---------------------------------------------------------------------------


def q133_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_data_pipeline_spark.functions.web import (
        robots_allowed_col,
        robots_rules_col,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    # Parse robots ONCE PER HOST, then join the parsed rules onto the
    # corpus — the scale shape robots_rules_col's docstring prescribes
    # (its group-id prefix sum is O(lines^2) interpreted work; running
    # it per DOCUMENT instead of per host measured 25 s vs ~3 s at 50k
    # docs, and a real crawl has ~1 robots file per millions of URLs).
    srcnum = F.substring("source", 4, 10).cast("int")
    robots = F.concat(
        F.lit("# registry crawl policy\nUser-agent: googlebot\nDisallow: /private\n\nUser-agent: *\n"),
        F.when(
            srcnum % 3 == 0,
            F.lit("Allow: /files/public\nDisallow: /files\n"),
        )
        .when(srcnum % 3 == 1, F.lit("Disallow: /tmp\n"))
        .otherwise(F.lit("Disallow:\n")),
    )
    per_host = (
        docs.select("source")
        .distinct()
        .select("source", robots_rules_col(robots).alias("__rules"))
    )
    path = F.concat(
        F.when(F.col("doc_id") % 4 == 0, F.lit("/files/public/doc-"))
        .when(F.col("doc_id") % 4 == 1, F.lit("/files/doc-"))
        .when(F.col("doc_id") % 4 == 2, F.lit("/tmp/doc-"))
        .otherwise(F.lit("/doc-")),
        F.col("doc_id").cast("string"),
    )
    return (
        docs.join(F.broadcast(per_host), "source")
        .select(
            "doc_id",
            "source",
            path.alias("path"),
            robots_allowed_col(F.col("__rules"), path).alias("allowed"),
        )
        .orderBy("doc_id")
    )


_Q133_SQL = """
SELECT doc_id,
       source,
       CASE doc_id % 4 WHEN 0 THEN '/files/public/doc-'
                       WHEN 1 THEN '/files/doc-'
                       WHEN 2 THEN '/tmp/doc-'
                       ELSE '/doc-' END || CAST(doc_id AS VARCHAR) AS path,
       CASE WHEN CAST(substr(source, 4) AS INT) % 3 = 0 AND doc_id % 4 = 1 THEN FALSE
            WHEN CAST(substr(source, 4) AS INT) % 3 = 1 AND doc_id % 4 = 2 THEN FALSE
            ELSE TRUE END AS allowed
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q134 — image-header metadata at scale: real PNG/GIF binaries (built
# through the stdlib PNG codec on the driver for the 35 distinct
# dimension combos, broadcast-joined onto the corpus) probed by the
# PURE-COLUMN header parser — no Python crossing, O(header) bytes per
# row. The oracle states every dimension from the doc_id arithmetic.
# ---------------------------------------------------------------------------


def q134_image_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    import struct

    from gov_data_pipeline_spark.sources.multimodal import image_header_col

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    rows = []
    for m7 in range(7):
        for m5 in range(5):
            rows.append(
                (
                    m7,
                    m5,
                    solid_png(m7 + 1, m5 + 1, (m7 * 30, m5 * 40, 7)),
                    b"GIF89a"
                    + struct.pack("<HH", 100 + m7, 50 + m5)
                    + b"\x00\x00\x00",
                )
            )
    lookup = spark.createDataFrame(
        rows, "m7 int, m5 int, png binary, gif binary"
    )
    media = docs.join(
        F.broadcast(lookup),
        (F.col("doc_id") % 7 == F.col("m7"))
        & (F.col("doc_id") % 5 == F.col("m5")),
    ).select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.col("gif"))
        .otherwise(F.col("png"))
        .alias("data"),
    )
    hdr = image_header_col(F.col("data"))
    return media.select(
        "doc_id",
        hdr["format"].alias("format"),
        hdr["width"].alias("width"),
        hdr["height"].alias("height"),
    ).orderBy("doc_id")


_Q134_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'gif' ELSE 'png' END AS format,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 100 + doc_id % 7
                 ELSE doc_id % 7 + 1 END AS BIGINT) AS width,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 50 + doc_id % 5
                 ELSE doc_id % 5 + 1 END AS BIGINT) AS height
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q141 — JPEG dimension probing at scale: q134's column expression
# covers fixed-offset headers (PNG/GIF); JPEG dimensions live in an
# SOFn segment at a DATA-DEPENDENT offset (after APP/JFIF segments),
# so a mixed-format corpus routes through the Arrow-batched marker
# walk (`sources/multimodal.probe_image_meta` over
# `png_codec.image_info`). Blobs synthesized deterministically from
# doc_id — real JFIF skeletons (SOI+APP0+SOF0+EOI) with a PNG mix and
# junk rows to prove fallthrough — so the oracle states the expected
# output directly, same construction as q134.
# ---------------------------------------------------------------------------


def q141_jpeg_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gov_data_pipeline_spark.sources.multimodal import probe_image_meta
    from gov_data_pipeline_spark.sources.png_codec import build_minimal_jpeg

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    rows = []
    for m7 in range(7):
        for m5 in range(5):
            rows.append(
                (
                    m7,
                    m5,
                    build_minimal_jpeg(640 + m7, 360 + m5),
                    solid_png(m7 + 2, m5 + 2, (m7 * 20, m5 * 30, 9)),
                )
            )
    lookup = spark.createDataFrame(
        rows, "m7 int, m5 int, jpg binary, png binary"
    )
    media = docs.join(
        F.broadcast(lookup),
        (F.col("doc_id") % 7 == F.col("m7"))
        & (F.col("doc_id") % 5 == F.col("m5")),
    ).select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 1, F.col("png"))
        .when(F.col("doc_id") % 4 == 3, F.lit(b"not an image"))
        .otherwise(F.col("jpg"))
        .alias("data"),
    )
    return probe_image_meta(media, "data", "doc_id").orderBy("doc_id")


_Q141_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 4 = 1 THEN 'png'
            WHEN doc_id % 4 = 3 THEN NULL
            ELSE 'jpeg' END AS format,
       CAST(CASE WHEN doc_id % 4 = 1 THEN doc_id % 7 + 2
                 WHEN doc_id % 4 = 3 THEN NULL
                 ELSE 640 + doc_id % 7 END AS BIGINT) AS width,
       CAST(CASE WHEN doc_id % 4 = 1 THEN doc_id % 5 + 2
                 WHEN doc_id % 4 = 3 THEN NULL
                 ELSE 360 + doc_id % 5 END AS BIGINT) AS height
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q135 — media-container metadata at scale: real ISO-BMFF (MP4) boxes
# walked by the Arrow-batched prober and canonical PCM WAV headers
# probed by the pure-column parser — the no-decode metadata pass over
# a mixed audio/video corpus. Binaries built by the spec-shaped
# fixture builders for the 105 distinct parameter combos on the
# driver and broadcast onto the corpus; the oracle states every field
# from the doc_id arithmetic.
# ---------------------------------------------------------------------------


def q135_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    import struct

    from gov_data_pipeline_spark.sources.mp4_boxes import build_minimal_mp4
    from gov_data_pipeline_spark.sources.multimodal import (
        probe_video_meta,
        wav_header_col,
    )

    def wav_bytes(rate: int, ch: int, secs: int) -> bytes:
        dsz = rate * ch * 2 * secs
        return (
            b"RIFF" + struct.pack("<I", 36 + dsz) + b"WAVEfmt "
            + struct.pack(
                "<IHHIIHH", 16, 1, ch, rate, rate * ch * 2, ch * 2, 16
            )
            + b"data" + struct.pack("<I", dsz)
        )

    rates = (8000, 16000, 44100)
    rows = []
    for m5 in range(5):
        for m7 in range(7):
            for m3 in range(3):
                rows.append(
                    (
                        m5, m7, m3,
                        build_minimal_mp4(
                            1000 * (m5 + 1),
                            640 + 16 * m7,
                            360 + 9 * m7,
                            n_tracks=m3 + 1,
                        ),
                        wav_bytes(rates[m3], m5 % 2 + 1, m7 % 3 + 1),
                    )
                )
    lookup = spark.createDataFrame(
        rows, "m5 int, m7 int, m3 int, mp4 binary, wav binary"
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = docs.join(
        F.broadcast(lookup),
        (F.col("doc_id") % 5 == F.col("m5"))
        & (F.col("doc_id") % 7 == F.col("m7"))
        & (F.col("doc_id") % 3 == F.col("m3")),
    )

    videos = media.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", F.col("mp4").alias("data")
    )
    vmeta = probe_video_meta(videos, "data", "doc_id").select(
        "doc_id",
        F.lit("mp4").alias("kind"),
        "duration_ms",
        "width",
        "height",
        "n_tracks",
        F.lit(None).cast("long").alias("channels"),
        F.lit(None).cast("long").alias("sample_rate"),
    )
    wavs = media.filter(F.col("doc_id") % 2 == 1)
    whdr = wav_header_col(F.col("wav"))
    wmeta = wavs.select(
        "doc_id",
        F.lit("wav").alias("kind"),
        whdr["duration_ms"].alias("duration_ms"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        F.lit(None).cast("long").alias("n_tracks"),
        whdr["channels"].alias("channels"),
        whdr["sample_rate"].alias("sample_rate"),
    )
    return vmeta.unionByName(wmeta).orderBy("doc_id")


_Q135_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'wav' END AS kind,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 1000 * (doc_id % 5 + 1)
                 ELSE 1000 * (doc_id % 7 % 3 + 1) END AS BIGINT) AS duration_ms,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 640 + 16 * (doc_id % 7) END AS BIGINT) AS width,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 360 + 9 * (doc_id % 7) END AS BIGINT) AS height,
       CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 3 + 1 END AS BIGINT) AS n_tracks,
       CAST(CASE WHEN doc_id % 2 = 1 THEN doc_id % 5 % 2 + 1 END AS BIGINT) AS channels,
       CAST(CASE WHEN doc_id % 2 = 1
                 THEN CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END
            END AS BIGINT) AS sample_rate
FROM documents
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q136 — parquet sink round-trip (T3's oracle row): write a projected,
# PARTITIONED copy of lineitem through the engine sink, read it back,
# and aggregate per partition value with a partition-pruning filter.
# The hash only matches if the sink preserved every row and value
# (partition columns included) — DuckDB aggregates the original table
# directly. A fresh numbered subdir per invocation gives a TWO-
# GENERATION validity window: the current and the previous
# invocation's returned DataFrames stay collectable (overwriting ONE
# stable dir would break even the immediately preceding one), while
# anything older is deleted and will raise FileNotFoundException on
# re-collect. That bounds /tmp to two copies instead of one-per-sweep
# (the round-5 ADVICE leak); callers holding a handle from three or
# more invocations ago must re-run the query, not re-collect.
# ---------------------------------------------------------------------------

_Q136_SEQ: dict[str, int] = {}


def q136_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from gov_data_pipeline_spark.sources.files import write_parquet

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"
    )
    base = os.path.join(
        tempfile.gettempdir(),
        "q136_roundtrip_%d_%s"
        % (os.getpid(), sf_dir.strip("/").replace("/", "_")),
    )
    seq = _Q136_SEQ.get(base, 0)
    _Q136_SEQ[base] = seq + 1
    out = f"{base}_{seq}"
    shutil.rmtree(f"{base}_{seq - 2}", ignore_errors=True)
    write_parquet(li, out, mode="overwrite", partition_by=["l_returnflag"])
    # explicit schema: a 0-row write leaves no footer to infer from
    # (an always-possible outcome of an upstream filter), and pinning
    # the schema also skips the inference file-listing pass
    back = spark.read.schema(li.schema).parquet(out)
    return (
        back.filter(F.col("l_returnflag") != "N")  # partition-pruned scan
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q136_SQL = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
FROM lineitem
WHERE l_returnflag <> 'N'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q151 — small-file compaction round-trip (the driver-checkable oracle
# row for operators/layout.compact_parquet, COVERAGE L8k): write a
# deliberately FRAGMENTED copy of orders (48 round-robin shards — the
# one-file-per-micro-batch shape streaming sinks leave behind), run the
# compaction maintenance pass, read the compacted copy back and
# aggregate. The hash matches only if compaction preserved every row
# and value; ``files_collapsed`` additionally pins the layout claim
# (output file count strictly below the fragment count — computed from
# the actual post-compaction listing, emitted as TRUE by the oracle).
# Same two-generation tmp-dir protocol as q136.
# ---------------------------------------------------------------------------

_Q151_SEQ: dict[str, int] = {}


def q151_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from gov_data_pipeline_spark.operators.layout import compact_parquet
    from gov_data_pipeline_spark.sources.files import write_parquet

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    base = os.path.join(
        tempfile.gettempdir(),
        "q151_compact_%d_%s"
        % (os.getpid(), sf_dir.strip("/").replace("/", "_")),
    )
    seq = _Q151_SEQ.get(base, 0)
    _Q151_SEQ[base] = seq + 1
    shutil.rmtree(f"{base}_{seq - 2}", ignore_errors=True)
    n_frag = 48
    frag = f"{base}_{seq}/frag"
    dest = f"{base}_{seq}/compact"
    write_parquet(orders.repartition(n_frag), frag, mode="overwrite")
    written = compact_parquet(
        spark, frag, dest, target_file_bytes=256 * 1024 * 1024
    )
    back = spark.read.schema(orders.schema).parquet(dest)
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_price"),
            F.sum("o_orderkey").alias("key_sum"),
        )
        .withColumn("files_collapsed", F.lit(written < n_frag))
        .orderBy("o_orderpriority")
    )


_Q151_SQL = """
SELECT o_orderpriority,
       count(*) AS n_rows,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
       TRUE AS files_collapsed
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# q152 — JSONL export round-trip (the driver-checkable oracle row for
# sources/files.write_jsonl, COVERAGE L8k): export documents as 4
# gzip-compressed JSONL shards — the training-corpus interchange
# layout — read them back with an explicit schema, and aggregate a
# content-sensitive digest (md5 prefix of each text, summed per
# language) against DuckDB over the ORIGINAL parquet. JSON string
# escaping, UTF-8 round-tripping, and null-field dropping
# (ignoreNullFields) must all be lossless for the hash to match.
# Same two-generation tmp-dir protocol as q136.
# ---------------------------------------------------------------------------

_Q152_SEQ: dict[str, int] = {}


def q152_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from gov_data_pipeline_spark.sources.files import write_jsonl

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    base = os.path.join(
        tempfile.gettempdir(),
        "q152_jsonl_%d_%s"
        % (os.getpid(), sf_dir.strip("/").replace("/", "_")),
    )
    seq = _Q152_SEQ.get(base, 0)
    _Q152_SEQ[base] = seq + 1
    shutil.rmtree(f"{base}_{seq - 2}", ignore_errors=True)
    out = f"{base}_{seq}"
    write_jsonl(docs, out, mode="overwrite", shards=4, compression="gzip")
    back = spark.read.schema(docs.schema).json(out)
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("chars"),
            F.sum(
                F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long")
            ).alias("text_digest"),
        )
        .orderBy("lang")
    )


_Q152_SQL = """
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS chars,
       CAST(sum(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT)) AS BIGINT) AS text_digest
FROM documents
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# q196 — SEEDED DETERMINISTIC TRAINING-EXPORT SHUFFLE (r12, verdict
# item #3): q152 pinned the jsonl sink's CONTENT; this pins its
# LAYOUT. write_jsonl(shuffle_by, shuffle_seed) makes shard
# membership AND within-shard line order pure functions of
# (seed, doc_id) — key = md5(seed ':' id), shard = int(key[:8]) mod
# shards, order = (key, id) — so a trainer re-running the export gets
# byte-identical shard sequences (the q165 md5-rank machinery composed
# into the sink). The query READS THE FILES BACK (gzip: one partition
# per file, so line order survives the scan), recovers each row's
# shard from its directory and its position from a per-file
# row_number, and the oracle re-derives the full (doc_id, shard, pos)
# assignment from scratch in DuckDB — the files on disk must agree
# with closed-form math or the hash fails. Rerun stability (same
# bytes twice) is additionally pinned in tests/test_sources_files.py.
# ---------------------------------------------------------------------------

_Q196_SEQ: dict[str, int] = {}


def _q196_reap_at_exit() -> None:
    """Remove every export dir this PROCESS created (review-caught
    r12: the two-generation in-run rotation reaps older generations
    but the pid-scoped base means the LAST one-two generations — a
    full gzip corpus at larger SFs — outlived the process and
    accumulated across driver/bench runs until the tmp cleaner ran).
    Registered once, on first use; a SIGKILLed process still leaks its
    final generation — the documented residue of any tmp-dir
    protocol."""
    import shutil

    for base, seq in _Q196_SEQ.items():
        for s in range(max(0, seq - 2), seq):
            shutil.rmtree(f"{base}_{s}", ignore_errors=True)


def q196_shuffled_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import os
    import shutil
    import tempfile

    from gov_data_pipeline_spark.sources.files import write_jsonl

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    base = os.path.join(
        tempfile.gettempdir(),
        "q196_shuf_%d_%s"
        % (os.getpid(), sf_dir.strip("/").replace("/", "_")),
    )
    if not _Q196_SEQ:
        atexit.register(_q196_reap_at_exit)
    seq = _Q196_SEQ.get(base, 0)
    _Q196_SEQ[base] = seq + 1
    shutil.rmtree(f"{base}_{seq - 2}", ignore_errors=True)
    out = f"{base}_{seq}"
    write_jsonl(
        docs, out, mode="overwrite", shards=8, compression="gzip",
        shuffle_by="doc_id", shuffle_seed=7,
    )
    from pyspark.sql import Window as W

    # Degenerate-input contract (test_every_query_survives_empty_tables):
    # an empty corpus writes a layout with no shard directories at all,
    # so the read-back glob would raise PATH_NOT_FOUND — the local
    # listing is the honest emptiness probe (the export dir is this
    # query's own tmp dir, driver-local by construction).
    import glob as _glob

    if not _glob.glob(os.path.join(out, "shard=*", "part-*")):
        return spark.createDataFrame(
            [], "doc_id long, shard int, pos int"
        )
    lines = (
        spark.read.text(os.path.join(out, "shard=*", "part-*"))
        .select(
            F.get_json_object("value", "$.doc_id").cast("long").alias("doc_id"),
            F.regexp_extract(
                F.input_file_name(), r"shard=([0-9]+)", 1
            ).cast("int").alias("shard"),
            F.monotonically_increasing_id().alias("__mid"),
            F.input_file_name().alias("__f"),
        )
    )
    # gzip files are unsplittable — one scan partition per file, so
    # __mid increases in physical line order within each file and the
    # per-file row_number is the line's 1-based position in the shard
    pos = F.row_number().over(
        W.partitionBy("__f").orderBy(F.col("__mid").asc())
    )
    return (
        lines.select("doc_id", "shard", pos.alias("pos"))
        .orderBy("shard", "pos")
    )


_Q196_SQL = """
WITH keyed AS (
  SELECT doc_id,
         md5('7:' || CAST(doc_id AS VARCHAR)) AS key,
         CAST(('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 8))
                ::BIGINT % 8 AS INT) AS shard
  FROM documents)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard
                               ORDER BY key, doc_id) AS INT) AS pos
FROM keyed
ORDER BY shard, pos
"""


# ---------------------------------------------------------------------------
# q162 — Excel sink round-trip (the driver-checkable oracle row for
# sources/excel.write_excel, COVERAGE R26/T4-sink): slice lineitem
# deterministically, write it through the stdlib xlsx writer, read it
# back with read_excel (all-strings + header row), re-type by position
# and aggregate against DuckDB over the ORIGINAL parquet rows. The
# hash matches only if the sink's stringification (longs without
# '.0', doubles shortest-repr, nulls as empty cells) and the codec's
# SpreadsheetML escaping round-trip every value losslessly. The slice
# keeps the driver-side collect at report size — write_excel's
# documented regime (datasets go to write_parquet). Same
# two-generation tmp-dir protocol as q136/q151/q152.
# ---------------------------------------------------------------------------

_Q162_SEQ: dict[str, int] = {}


def q162_excel_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from gov_data_pipeline_spark.sources.excel import read_excel, write_excel

    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 97 == 0
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    base = os.path.join(
        tempfile.gettempdir(),
        "q162_excel_%d_%s"
        % (os.getpid(), sf_dir.strip("/").replace("/", "_")),
    )
    seq = _Q162_SEQ.get(base, 0)
    _Q162_SEQ[base] = seq + 1
    shutil.rmtree(f"{base}_{seq - 2}", ignore_errors=True)
    os.makedirs(f"{base}_{seq}", exist_ok=True)
    path = f"{base}_{seq}/slice.xlsx"
    write_excel(li, path)
    back = read_excel(spark, path)
    # row 0 is the header write_excel emits; re-type by position
    parsed = back.filter(F.col("row_idx") > 0).select(
        F.col("c0").cast("long").alias("l_orderkey"),
        F.col("c1").cast("int").alias("l_linenumber"),
        F.col("c2").cast("double").alias("l_quantity"),
        F.col("c3").alias("l_returnflag"),
    )
    return (
        parsed.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(18,2)")), 2
            )
            .cast("double")
            .alias("sum_qty"),
            F.sum("l_orderkey").alias("key_sum"),
            F.sum("l_linenumber").alias("line_sum"),
        )
        .orderBy("l_returnflag")
    )


_Q162_SQL = """
SELECT l_returnflag,
       count(*) AS n_rows,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(sum(l_orderkey) AS BIGINT) AS key_sum,
       CAST(sum(l_linenumber) AS BIGINT) AS line_sum
FROM lineitem
WHERE l_orderkey % 97 = 0
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


QUERIES = {
    "q81_xlsx_image_extract": q81_xlsx_image_extract,
    "q82_docx_ingest": q82_docx_ingest,
    "q83_row_index_ingest": q83_row_index_ingest,
    "q129_html_extract": q129_html_extract,
    "q130_url_normalize": q130_url_normalize,
    "q131_pagerank": q131_pagerank,
    "q137_pagerank_mass": q137_pagerank_mass,
    "q132_sitemap_extract": q132_sitemap_extract,
    "q133_robots_gate": q133_robots_gate,
    "q134_image_dims": q134_image_dims,
    "q141_jpeg_dims": q141_jpeg_dims,
    "q135_media_meta": q135_media_meta,
    "q136_parquet_roundtrip": q136_parquet_roundtrip,
    "q151_compact_roundtrip": q151_compact_roundtrip,
    "q152_jsonl_roundtrip": q152_jsonl_roundtrip,
    "q196_shuffled_export": q196_shuffled_export,
    "q162_excel_roundtrip": q162_excel_roundtrip,
}

ORACLE = {
    "q81_xlsx_image_extract": _Q81_SQL,
    "q82_docx_ingest": _Q82_SQL,
    "q83_row_index_ingest": _Q83_SQL,
    "q129_html_extract": _Q129_SQL,
    "q130_url_normalize": _Q130_SQL,
    "q131_pagerank": _Q131_SQL,
    "q137_pagerank_mass": _Q137_SQL,
    "q132_sitemap_extract": _Q132_SQL,
    "q133_robots_gate": _Q133_SQL,
    "q134_image_dims": _Q134_SQL,
    "q141_jpeg_dims": _Q141_SQL,
    "q135_media_meta": _Q135_SQL,
    "q136_parquet_roundtrip": _Q136_SQL,
    "q151_compact_roundtrip": _Q151_SQL,
    "q152_jsonl_roundtrip": _Q152_SQL,
    "q196_shuffled_export": _Q196_SQL,
    "q162_excel_roundtrip": _Q162_SQL,
}
