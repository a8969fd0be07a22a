"""Web-corpus curation (q148-q150): planted-boilerplate strip proof,
blocklist/cap semantics, and URL-parse parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_data_warehouse_spark.functions.text import strip_html
from etl_data_warehouse_spark.plans import web_curation as wc


PLANTED = [
    # (raw html, exact expected visible text)
    (
        '<html><head><script>var x = "a < b";\nnav();</script>'
        "<style>p{margin:0}</style></head><body><p>body text here</p>"
        "</body></html>",
        "body text here",
    ),
    # entity decode order: '&amp;lt;' must become the literal '&lt;'
    # (single decode), never '<' (double decode)
    ("<p>tricky &amp;lt; entity</p>", "tricky &lt; entity"),
    # adjacent block tags must not glue words together
    ("<p>one</p><p>two</p>", "one two"),
    # nbsp + quote + amp decode and whitespace collapse
    ("<div>a&nbsp;&nbsp;b &quot;c&quot; &amp; d\n\n e</div>", 'a b "c" & d e'),
    # uppercase/attribute-heavy script tag variants
    (
        '<SCRIPT type="text/javascript">menu()</SCRIPT>visible'
        "<style media=\"all\">.x{}</style>",
        "visible",
    ),
]


def test_strip_html_planted(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(PLANTED)], "i int, raw string"
    )
    got = {
        r.i: r.clean
        for r in df.select(
            "i", strip_html("raw").alias("clean")
        ).collect()
    }
    for i, (_, expected) in enumerate(PLANTED):
        assert got[i] == expected, f"case {i}: {got[i]!r} != {expected!r}"


def test_strip_html_uppercase_script_body_removed(spark):
    # (?is): uppercase <SCRIPT> bodies are removed like lowercase ones,
    # including content with raw '<' inside
    raw = "<SCRIPT>a < b; junk()</SCRIPT>rest"
    got = (
        spark.createDataFrame([(raw,)], "raw string")
        .select(strip_html("raw").alias("c"))
        .collect()[0]
        .c
    )
    assert got == "rest"


def test_domain_cap_and_blocklist(spark):
    sf = "/root/testdata/sf0.01"
    kept = wc.q149_domain_cap_filter(spark, sf)
    rows = kept.collect()
    assert rows, "cap filter returned nothing"
    per_host: dict[str, int] = {}
    for r in rows:
        per_host[r.host] = per_host.get(r.host, 0) + 1
        assert r.dom_rank <= wc._DOMAIN_CAP
    assert max(per_host.values()) <= wc._DOMAIN_CAP

    report = wc.q148_domain_curation_report(spark, sf).collect()
    blocked = {r.host for r in report if r.is_blocked}
    assert blocked, "blocklist rule selected no hosts at sf0.01"
    assert not (blocked & set(per_host)), "blocked host survived the anti-join"
    # the cap must actually bind somewhere: some unblocked host has
    # more docs than the cap and exactly cap survivors
    capped = [
        r.host
        for r in report
        if not r.is_blocked and r.n_docs > wc._DOMAIN_CAP
    ]
    assert capped and all(per_host[h] == wc._DOMAIN_CAP for h in capped)


def test_parse_url_host_parity(spark):
    # parse_url(HOST) must recover exactly the host doc_url() embedded,
    # and every tld is from the fixed pool
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = (
        docs.select("doc_id", "source")
        .withColumn("url", wc.doc_url())
        .withColumn("parsed", F.parse_url(F.col("url"), F.lit("HOST")))
        .withColumn("split", F.split_part(F.col("url"), F.lit("/"), F.lit(3)))
    )
    bad = df.filter(
        (F.col("parsed") != F.col("split"))
        | ~F.substring_index("parsed", ".", -1).isin(*wc._TLDS)
    ).count()
    assert bad == 0


def test_curation_determinism(spark):
    # md5 rank, not rand: two runs keep the SAME docs
    sf = "/root/testdata/sf0.001"
    a = sorted(r.doc_id for r in wc.q149_domain_cap_filter(spark, sf).collect())
    b = sorted(r.doc_id for r in wc.q149_domain_cap_filter(spark, sf).collect())
    assert a == b


def test_curate_documents_matches_q149(spark):
    # the reusable transform keeps EXACTLY the q149 verdict set at the
    # same cap (the query derives the blocklist as a frame; the
    # transform applies the rule directly — same rule, same survivors)
    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = sorted(
        r.doc_id
        for r in wc.curate_documents(docs, domain_cap=wc._DOMAIN_CAP)
        .select("doc_id")
        .collect()
    )
    want = sorted(
        r.doc_id for r in wc.q149_domain_cap_filter(spark, sf).collect()
    )
    assert got == want


def test_corpus_pipeline_with_curation(spark, tmp_path):
    from etl_data_warehouse_spark.plans.corpus_pipeline import (
        run_corpus_pipeline,
    )

    audit = run_corpus_pipeline(
        spark,
        "/root/testdata/sf0.001",
        str(tmp_path / "corpus_curated"),
        curate=True,
        domain_cap=wc._DOMAIN_CAP,
    )
    assert audit["status"] == "SUCCESS"
    assert audit["curation_dropped"] > 0
    docs = spark.read.parquet(f"/root/testdata/sf0.001/documents.parquet")
    expected_kept = wc.curate_documents(docs, domain_cap=wc._DOMAIN_CAP).count()
    assert audit["curation_dropped"] == audit["records_ingested"] - expected_kept


# --- randomized cross-engine differential for the q150 strip chain -----------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_frag = st.sampled_from(
    [
        "plain words here",
        "<p>", "</p>", "<div class='x'>", "</div>",
        "<script>var a = 1 < 2;</script>",
        "<SCRIPT>junk()</SCRIPT>",
        "<style>.a{b:c}</style>",
        "&amp;", "&lt;", "&gt;", "&quot;", "&nbsp;", "&amp;lt;",
        "  ", "\n", "\t", "\x0b", "\x0c", "\r", "a<b", "x > y",
        "<br/>", "<a href='/'>l</a>",
        "<script type=\"text/javascript\">\nmulti\nline\n</script>",
    ]
)
_html_docs = st.lists(
    st.lists(_frag, min_size=0, max_size=10).map("".join),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_html_docs)
def test_strip_html_spark_equals_duckdb(spark, docs):
    """Randomized markup through BOTH engines' strip chains — the
    differential defense of q150's hash gate beyond the fixed corpus."""
    import duckdb

    from etl_data_warehouse_spark.functions.text import strip_html_sql

    sdf = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "i int, raw string"
    )
    got = {
        r.i: r.c
        for r in sdf.select("i", strip_html("raw").alias("c")).collect()
    }
    con = duckdb.connect()
    for i, d in enumerate(docs):
        want = con.execute(
            f"select {strip_html_sql('?')}", [d]
        ).fetchone()[0]
        assert got[i] == want, f"doc {i}: {got[i]!r} != {want!r} ({d!r})"


# --- URL-grammar differential for the host-extraction twins ------------------
# The curation twins agree via two different mechanisms: Spark
# parse_url(url, 'HOST') (a real URL parser) vs the oracle's
# split_part(url, '/', 3) (positional). They are provably identical
# only over the SUPPORTED URL GRAMMAR documented on
# web_curation._with_host: scheme://host/path with lowercase scheme,
# no userinfo, no explicit port. The hypothesis differential sweeps
# that grammar with adversarial host shapes (hyphens, multi-label,
# trailing dots, digits, IDN-ish xn-- labels); a second test pins the
# KNOWN divergence classes outside the grammar so the boundary is
# explicit, not folklore.

_label = st.from_regex(r"[a-z0-9]([a-z0-9-]{0,8}[a-z0-9])?", fullmatch=True)
# the TOP label must start with a letter: java.net.URI (behind
# parse_url) implements RFC 2396's toplabel rule and returns a null
# host for e.g. "xn--0.0" (hypothesis found it) — real TLDs always
# start with a letter, and doc_url's do
_top_label = st.from_regex(r"[a-z]([a-z0-9-]{0,8}[a-z0-9])?", fullmatch=True)
_host = st.builds(
    lambda labels, top, xn: ".".join(
        (["xn--" + (labels[0] if labels else top)] if xn else [])
        + labels
        + [top]
    ),
    st.lists(_label, min_size=0, max_size=3),
    _top_label,
    st.booleans(),
)
# no bare '%': a non-escape percent makes the whole URL invalid for
# java.net.URI (parse_url THROWS [INVALID_URL], it doesn't null out)
_path_seg = st.from_regex(r"[A-Za-z0-9._~!$&'()*+,;=:@-]{0,8}", fullmatch=True)
_url = st.builds(
    lambda host, dot, segs, q: (
        "https://"
        + host
        + ("." if dot else "")
        + ("/" + "/".join(segs) if segs else "")
        # a query REQUIRES a path: in "https://host?a=1" the third
        # '/'-field is "host?a=1", so split_part keeps the query while
        # parse_url(HOST) stops at '?'. hypothesis found this edge —
        # it is now part of the documented grammar (doc_url always
        # emits a path).
        + (("?" + q) if (q and segs) else "")
    ),
    _host,
    st.booleans(),  # trailing dot on the host (valid FQDN form)
    st.lists(_path_seg, min_size=0, max_size=3),
    st.sampled_from(["", "a=1", "a=1&b=2"]),
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_url, min_size=1, max_size=8))
def test_parse_url_host_equals_split_part_on_grammar(spark, urls):
    import duckdb

    sdf = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i int, url string"
    )
    got = {
        r.i: r.h
        for r in sdf.select(
            "i", F.parse_url(F.col("url"), F.lit("HOST")).alias("h")
        ).collect()
    }
    con = duckdb.connect()
    for i, u in enumerate(urls):
        want = con.execute(
            "select split_part(?, '/', 3)", [u]
        ).fetchone()[0]
        assert got[i] == want, f"{u!r}: parse_url={got[i]!r} split={want!r}"


def test_host_extraction_divergence_outside_grammar(spark):
    """The documented boundary: userinfo and explicit ports are part of
    the URL AUTHORITY — split_part keeps them verbatim, parse_url(HOST)
    strips them. Any future doc_url change that emits these forms must
    also move q148/q149's oracle off split_part."""
    cases = {
        # url: (parse_url HOST, split_part field 3)
        "https://user@example.com/x": ("example.com", "user@example.com"),
        "https://example.com:8443/x": ("example.com", "example.com:8443"),
        "https://u:p@ex.org:80/": ("ex.org", "u:p@ex.org:80"),
    }
    sdf = spark.createDataFrame(
        [(u,) for u in cases], "url string"
    ).select(
        "url", F.parse_url(F.col("url"), F.lit("HOST")).alias("h")
    )
    got = {r.url: r.h for r in sdf.collect()}
    import duckdb

    con = duckdb.connect()
    for u, (want_host, want_split) in cases.items():
        assert got[u] == want_host
        assert (
            con.execute("select split_part(?, '/', 3)", [u]).fetchone()[0]
            == want_split
        )
