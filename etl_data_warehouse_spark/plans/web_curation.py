"""Web-corpus curation at the URL/domain grain — q148-q150.

The standard FIRST stage of a CommonCrawl-style 100 TB text pipeline:
derive/parse URLs, profile domains, drop blocklisted hosts, cap
over-represented domains, and strip HTML boilerplate. The reference's
closest analogue is its staging null-gate cleaning (reference:
dbt_warehouse/models/staging/stg_orders.sql and
transformers/data_transformer.py clean_* methods) — this module is
that cleaning stage for web text, which the reference never reaches.

The documents table carries no URL column, so one is DERIVED
deterministically from (source, doc_id) via md5 — both engines build
the identical string, which keeps every query under the driver's hash
gate while exercising the real operators (Spark-side ``parse_url``,
broadcast blocklist anti-join, per-domain rank cap, regexp boilerplate
strip). Host cardinality is BOUNDED (≤ sources × _HOST_MOD) so the
domain grain behaves like real web data: many docs per host.

100 TB posture, per query:
- q148 report: ONE shuffle (groupBy host); output is host-grain.
- q149 filter: blocklist frame is host-grain (bounded) and BROADCAST
  for the anti-join; the per-domain cap is one window shuffle keyed on
  host — the md5 rank makes the kept set reproducible run-over-run,
  and AQE's skew handling splits a mega-host partition if one appears.
- q150 strip: pure projection (zero shuffles) — repartitioned at entry
  only because the testdata parquet is a single row group and the
  regex chain is CPU-heavy (CLAUDE.md rule); on a real multi-file
  corpus the scan parallelism already exists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import strip_html, strip_html_sql
from ..operators.sampling import bucket_sql, hash_bucket
from ..sources.catalog import load_table

# Hosts per source: bounds domain cardinality at sources × 11 so the
# domain grain has many docs per host at every SF (and ~quadrillions of
# rows per host would still profile fine — the report is host-grain).
_HOST_MOD = 11
_TLDS = ["com", "org", "net", "io"]
# Blocklist rule: ~15% of hosts (simulates an external spam/adult
# domain list; deterministic so the DuckDB twin derives the same set).
_BLOCK_BUCKETS = 100
_BLOCK_BELOW = 15
# Per-domain document cap (q149): binds at sf0.01+ where hosts hold
# 2-23 docs; the keep choice is an md5 rank, not rand — reproducible.
_DOMAIN_CAP = 2


def doc_url() -> Column:
    """Deterministic URL for a documents row (needs source, doc_id)."""
    hh = F.md5(
        F.concat(
            F.lit("host"),
            F.col("source"),
            F.lit("#"),
            (F.col("doc_id") % _HOST_MOD).cast("string"),
        )
    )
    tld_idx = (
        F.conv(F.substring(hh, 1, 2), 16, 10).cast("int") % len(_TLDS) + 1
    )
    host = F.concat(
        F.substring(hh, 3, 8),
        F.lit("."),
        F.element_at(F.array(*[F.lit(t) for t in _TLDS]), tld_idx),
    )
    ph = F.md5(F.concat(F.lit("path"), F.col("doc_id").cast("string")))
    return F.concat(
        F.lit("https://"),
        host,
        F.lit("/"),
        F.substring(ph, 1, 6),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit(".html"),
    )


def doc_url_sql(alias: str = "") -> str:
    """DuckDB twin of :func:`doc_url` (column refs optionally
    ``alias.``-qualified)."""
    a = f"{alias}." if alias else ""
    hh = f"md5('host' || {a}source || '#' || ({a}doc_id % {_HOST_MOD})::VARCHAR)"
    tld = (
        f"(CASE (('0x' || substring({hh}, 1, 2))::BIGINT % {len(_TLDS)}) "
        + " ".join(
            f"WHEN {i} THEN '{t}'" for i, t in enumerate(_TLDS[:-1])
        )
        + f" ELSE '{_TLDS[-1]}' END)"
    )
    host = f"(substring({hh}, 3, 8) || '.' || {tld})"
    ph = f"md5('path' || {a}doc_id::VARCHAR)"
    return (
        f"('https://' || {host} || '/' || substring({ph}, 1, 6) || '/' "
        f"|| {a}doc_id::VARCHAR || '.html')"
    )


def _with_host(docs: DataFrame) -> DataFrame:
    """url + host columns; host comes out of Spark's own URL parser
    (``parse_url(url, 'HOST')``) — the real operator a crawl pipeline
    runs — while the oracle extracts it with split_part.

    SUPPORTED URL GRAMMAR (where the two provably agree —
    hypothesis-swept in tests/test_web_curation.py):
    ``scheme://host[/path[?query]]`` with a lowercase scheme, NO
    userinfo, NO explicit port, and a query only AFTER a path (in
    ``scheme://host?q`` the third '/'-field is ``host?q``, so
    split_part keeps the query); host may be any dot-separated label
    sequence incl. trailing dots and xn-- (IDN) labels. Outside the
    grammar they DIVERGE by construction: userinfo and ports are part
    of the authority, which split_part keeps verbatim while
    parse_url(HOST) strips (divergence classes pinned in
    test_host_extraction_divergence_outside_grammar). doc_url()
    only ever emits the supported form (it always has a path)."""
    return docs.withColumn("url", doc_url()).withColumn(
        "host", F.parse_url(F.col("url"), F.lit("HOST"))
    )


_HOST_SQL = "split_part(url, '/', 3)"


def blocklisted(host: Column | str) -> Column:
    h = F.col(host) if isinstance(host, str) else host
    return hash_bucket(h, "blocklist", _BLOCK_BUCKETS) < _BLOCK_BELOW


def _blocklisted_sql(host_expr: str) -> str:
    return f"({bucket_sql(host_expr, 'blocklist', _BLOCK_BUCKETS)} < {_BLOCK_BELOW})"


# --- q148: per-domain curation report ----------------------------------------


def q148_domain_curation_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Domain-grain crawl profile: docs, bytes, source spread, and the
    blocklist verdict per host — the report a curation run reads before
    deciding caps. One shuffle (host groupBy); host-grain output."""
    docs = load_table(
        spark, "documents", sf_dir, columns=["doc_id", "source", "n_chars"]
    )
    return (
        _with_host(docs)
        .groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.countDistinct("source").cast("long").alias("n_sources"),
        )
        .withColumn("tld", F.substring_index(F.col("host"), ".", -1))
        .withColumn("is_blocked", blocklisted("host"))
        .select(
            "host", "tld", "n_docs", "total_chars", "n_sources", "is_blocked"
        )
        .orderBy("host")
    )


Q148_ORACLE = f"""
WITH urled AS (
    SELECT doc_id, source, n_chars, {doc_url_sql()} AS url
    FROM documents
),
hosted AS (
    SELECT doc_id, source, n_chars, {_HOST_SQL} AS host FROM urled
)
SELECT host,
       split_part(host, '.', 2) AS tld,
       COUNT(*)::BIGINT AS n_docs,
       SUM(n_chars)::BIGINT AS total_chars,
       COUNT(DISTINCT source)::BIGINT AS n_sources,
       {_blocklisted_sql('host')} AS is_blocked
FROM hosted
GROUP BY host
ORDER BY host
"""


# --- q149: blocklist anti-join + per-domain cap -------------------------------


def q149_domain_cap_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the curation: drop blocklisted hosts via a broadcast
    anti-join against the (host-grain, bounded) blocklist frame, then
    keep at most _DOMAIN_CAP docs per surviving host, chosen by a
    deterministic md5 rank (re-runs keep the SAME docs; corpus growth
    only displaces docs whose rank falls). The anti-join ships KBs to
    every scan task; the cap is one window shuffle keyed on host."""
    docs = load_table(spark, "documents", sf_dir, columns=["doc_id", "source"])
    # ONE corpus scan for both consumers (blocklist derivation + the
    # rank window): the host-keyed repartition Exchange is shared via
    # ReuseExchange (q122 discipline) AND is exactly the partitioning
    # the window needs, so the cap adds no further shuffle. On a real
    # crawl the blocklist is an external broadcast table; deriving it
    # from the same scan here keeps the oracle self-contained.
    # host is md5-derived and never null, but the anti-join INFERS
    # isnotnull(host) on its build side and pushes it below that
    # branch's Exchange copy only (splitter class 2) — assert it
    # explicitly at entry so both copies canonicalize identically.
    # Host extraction here is split_part, not parse_url: the
    # ParseUrlEvaluator invoke defeats canonical plan equality (two
    # instantiations never compare equal), which would silently split
    # the shared Exchange; test_parse_url_host_parity pins that both
    # extractions recover the identical host on every row.
    hosted = (
        docs.withColumn("url", doc_url())
        .select(
            "doc_id",
            F.split_part(F.col("url"), F.lit("/"), F.lit(3)).alias("host"),
        )
        .filter(F.col("host").isNotNull())
        .repartition("host")
    )
    # blocklist derivation, written to ReuseExchange with the window
    # branch (q139 discipline): agg FIRST with the verdict as an AGG
    # OUTPUT (min over a key-constant boolean) so the filter cannot push
    # below the shared Exchange, and a tautological `_m >= 0` filter on
    # min(doc_id) so column pruning cannot drop doc_id from this
    # branch's copy of the Exchange — both copies canonicalize
    # identically and the corpus is scanned ONCE.
    block = (
        hosted.groupBy("host")
        .agg(
            F.min("doc_id").alias("_m"),
            F.min(blocklisted("host")).alias("blk"),
        )
        .filter(F.col("blk") & (F.col("_m") >= 0))
        .select("host")
    )
    rank = F.row_number().over(
        Window.partitionBy("host").orderBy(
            hash_bucket("doc_id", "domcap", 1_000_000).asc(),
            F.col("doc_id").asc(),
        )
    )
    # rank BEFORE the anti-join (they commute: the blocklist removes
    # whole hosts, never individual docs within a surviving host) so
    # the window consumes the shared Exchange directly — a broadcast
    # join between them would be pulled below the window's required
    # Exchange by the planner, splitting the reuse. The anti-join then
    # runs on the already-capped (≤ cap × hosts) frame.
    return (
        hosted.withColumn("dom_rank", rank.cast("long"))
        .filter(F.col("dom_rank") <= _DOMAIN_CAP)
        .join(F.broadcast(block), "host", "left_anti")
        .select("doc_id", "host", "dom_rank")
        .orderBy("doc_id")
    )


Q149_ORACLE = f"""
WITH urled AS (
    SELECT doc_id, {doc_url_sql()} AS url FROM documents
),
hosted AS (SELECT doc_id, {_HOST_SQL} AS host FROM urled),
kept AS (
    SELECT doc_id, host,
           ROW_NUMBER() OVER (
               PARTITION BY host
               ORDER BY {bucket_sql('doc_id', 'domcap', 1_000_000)} ASC,
                        doc_id ASC
           )::BIGINT AS dom_rank
    FROM hosted
    WHERE NOT {_blocklisted_sql('host')}
)
SELECT doc_id, host, dom_rank
FROM kept
WHERE dom_rank <= {_DOMAIN_CAP}
ORDER BY doc_id
"""


# --- q150: HTML/boilerplate strip fingerprint ---------------------------------

# Deterministic raw-crawl synthesis: the documents table is clean text,
# so the query FIRST wraps each doc in the kind of markup a crawler
# sees (nav/script/style/entity boilerplate; the <title> slot is left
# EMPTY and the per-source variation lands in the <h1> instead) and
# THEN strips it — the strip operator (functions/text.strip_html)
# is the product; the wrap just manufactures its input identically in
# both engines. tests/test_web_curation.py proves the strip recovers
# planted body text exactly.
_HTML_PREFIX = (
    '<html><head><title>%s</title><script type="text/javascript">'
    "var skip = 1 &amp;&amp; 2;\nmenu();</script>"
    "<style>.nav{display:none}</style></head><body>"
    '<nav><a href="/">Home</a> &gt; <a href="/docs">Docs</a></nav><h1>'
)
_HTML_MID = "</h1><p>"
_HTML_SUFFIX = (
    '</p><div class="footer">&quot;copyright&quot; &amp; terms'
    "&nbsp;apply</div></body></html>"
)


def _htmlify() -> Column:
    return F.concat(
        F.lit(_HTML_PREFIX % ""),
        F.col("source"),
        F.lit(_HTML_MID),
        F.col("text"),
        F.lit(_HTML_SUFFIX),
    ).alias("raw_html")


def _htmlify_sql() -> str:
    pre = (_HTML_PREFIX % "").replace("'", "''").replace("\n", "' || chr(10) || '")
    mid = _HTML_MID.replace("'", "''")
    suf = _HTML_SUFFIX.replace("'", "''")
    return f"('{pre}' || source || '{mid}' || text || '{suf}')"


def q150_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-strip transform fingerprint: raw (html-wrapped) vs
    cleaned length and an md5 of the cleaned text per doc. Projection
    only — the shape that runs as a map stage over a 100 TB crawl."""
    docs = load_table(spark, "documents", sf_dir, columns=["doc_id", "source", "text"])
    para = spark.sparkContext.defaultParallelism
    cleaned = (
        docs.repartition(para)
        .withColumn("raw_html", _htmlify())
        .withColumn("clean_text", strip_html("raw_html"))
    )
    return cleaned.select(
        "doc_id",
        F.length("raw_html").cast("int").alias("raw_len"),
        F.length("clean_text").cast("int").alias("clean_len"),
        F.md5("clean_text").alias("clean_fp"),
    ).orderBy("doc_id")


Q150_ORACLE = f"""
WITH raw AS (
    SELECT doc_id, {_htmlify_sql()} AS raw_html FROM documents
),
cleaned AS (
    SELECT doc_id, raw_html, {strip_html_sql('raw_html')} AS clean_text
    FROM raw
)
SELECT doc_id,
       length(raw_html)::INT AS raw_len,
       length(clean_text)::INT AS clean_len,
       md5(clean_text) AS clean_fp
FROM cleaned
ORDER BY doc_id
"""


# --- reusable curation transform (corpus-pipeline entry stage) ---------------


def hosted_unblocked(docs: DataFrame) -> DataFrame:
    """Stateless half of the curation funnel, shared by the batch
    transform below and the streaming twin
    (streaming/curation_stream.curated_document_stream) so the host
    derivation and blocklist rule can never diverge between them: url +
    split_part host columns, null-guarded, blocklisted hosts dropped."""
    return (
        docs.withColumn("url", doc_url())
        .withColumn(
            "host", F.split_part(F.col("url"), F.lit("/"), F.lit(3))
        )
        .filter(F.col("host").isNotNull())
        .filter(~blocklisted("host"))
        .drop("url")
    )


def curate_documents(
    docs: DataFrame, domain_cap: int | None = _DOMAIN_CAP
) -> DataFrame:
    """q148/q149 as a REUSABLE transform for pipeline composition
    (plans/corpus_pipeline.py runs it as the ingest-side stage, the
    position URL filtering holds in a real crawl pipeline): derive
    url/host, drop blocklisted hosts, cap docs per host by the
    deterministic md5 rank. Input: any frame with (doc_id, source,
    ...); output: input columns + host, minus blocklisted/over-cap
    rows. Same plan shape as q149 (one host-keyed Exchange shared by
    the rank window; blocklist rule applied as a direct filter here —
    no derivation pass needed when the rule, not a frame, is the
    source of truth)."""
    kept = hosted_unblocked(docs)
    if domain_cap is None:
        return kept
    rank = F.row_number().over(
        Window.partitionBy("host").orderBy(
            hash_bucket("doc_id", "domcap", 1_000_000).asc(),
            F.col("doc_id").asc(),
        )
    )
    return (
        kept.repartition("host")
        .withColumn("_dr", rank)
        .filter(F.col("_dr") <= domain_cap)
        .drop("_dr")
    )


QUERIES = {
    "q148_domain_curation_report": q148_domain_curation_report,
    "q149_domain_cap_filter": q149_domain_cap_filter,
    "q150_boilerplate_strip": q150_boilerplate_strip,
}
ORACLES = {
    "q148_domain_curation_report": Q148_ORACLE,
    "q149_domain_cap_filter": Q149_ORACLE,
    "q150_boilerplate_strip": Q150_ORACLE,
}


# --- q153: per-domain language mixture ----------------------------------------


def q153_domain_language_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language mixture at the domain grain — the report that decides
    which hosts feed which monolingual training mixtures (ties the
    curation family to the q21 lang-id axis). One host-grain shuffle;
    top language chosen by (count DESC, lang ASC) — a deterministic
    mode. share = exact BIGINT/BIGINT division at the output boundary."""
    docs = load_table(
        spark, "documents", sf_dir, columns=["doc_id", "source", "lang"]
    )
    hosted = _with_host(docs).select("host", "lang")
    per = hosted.groupBy("host", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("host").orderBy(
        F.col("n").desc(), F.col("lang").asc()
    )
    wall = Window.partitionBy("host")
    return (
        per.withColumn("r", F.row_number().over(w))
        .withColumn("n_docs", F.sum("n").over(wall).cast("long"))
        .withColumn("n_langs", F.count(F.lit(1)).over(wall).cast("long"))
        .filter(F.col("r") == 1)
        .select(
            "host",
            "n_docs",
            "n_langs",
            F.col("lang").alias("top_lang"),
            (F.col("n").cast("double") / F.col("n_docs").cast("double"))
            .alias("top_lang_share"),
        )
        .orderBy("host")
    )


Q153_ORACLE = f"""
WITH urled AS (
    SELECT doc_id, lang, {doc_url_sql()} AS url FROM documents
),
hosted AS (SELECT {_HOST_SQL} AS host, lang FROM urled),
per AS (
    SELECT host, lang, COUNT(*)::BIGINT AS n
    FROM hosted GROUP BY host, lang
),
ranked AS (
    SELECT host, lang, n,
           ROW_NUMBER() OVER (
               PARTITION BY host ORDER BY n DESC, lang ASC
           ) AS r,
           SUM(n) OVER (PARTITION BY host)::BIGINT AS n_docs,
           COUNT(*) OVER (PARTITION BY host)::BIGINT AS n_langs
    FROM per
)
SELECT host, n_docs, n_langs, lang AS top_lang,
       (n::DOUBLE / n_docs::DOUBLE) AS top_lang_share
FROM ranked
WHERE r = 1
ORDER BY host
"""

QUERIES["q153_domain_language_mix"] = q153_domain_language_mix
ORACLES["q153_domain_language_mix"] = Q153_ORACLE
