"""Text-analysis column expressions for the training-data pipeline ops.

All pure Catalyst expressions (JVM-side, whole-stage-codegen friendly);
the DuckDB oracle twins use the same regexes and the same sequential
left-fold semantics (Spark ``aggregate`` ≡ DuckDB ``list_reduce``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny English stopword set for the lexicon language heuristic.
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "on", "for"]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (regex ' +' over trimmed text)."""
    return F.split(F.trim(_c(col)), " +")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def bpe_ish_token_count(col: Column | str) -> Column:
    """Regex token count approximating a BPE pre-tokenizer: runs of
    letters, runs of digits, or single non-alnum marks."""
    return F.size(
        F.regexp_extract_all(_c(col), F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), F.lit(0))
    ).cast("long")


def punct_count(col: Column | str) -> Column:
    return F.size(
        F.regexp_extract_all(_c(col), F.lit("[^A-Za-z0-9 ]"), F.lit(0))
    ).cast("long")


def digit_count(col: Column | str) -> Column:
    return F.size(F.regexp_extract_all(_c(col), F.lit("[0-9]"), F.lit(0))).cast("long")


def stopword_hits(col: Column | str) -> Column:
    """Tokens that are English stopwords (lexicon heuristic)."""
    return F.size(
        F.filter(tokens(col), lambda t: F.lower(t).isin(EN_STOPWORDS))
    ).cast("long")


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (array<string>); empty when < n tokens."""
    t = tokens(col)
    return F.when(
        F.size(t) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(t, i + F.lit(k)) for k in range(n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_ngrams(col: Column | str, n: int = 2) -> Column:
    """All word n-grams in document order (array<string>, WITH repeats
    — word_shingles is the distinct variant); empty when < n tokens."""
    t = tokens(col)
    return F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + F.lit(k)) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


# PII patterns shared by the Spark path and the DuckDB oracle twin.
# Both engines' regex dialects (Java util.regex / RE2) agree on this
# subset: character classes, bounded repeats, \d, word boundaries.
PII_PATTERNS: list[tuple[str, str, str]] = [
    # (name, pattern, replacement) — applied IN ORDER (SSN before the
    # generic phone shape so 123-45-6789 is not half-eaten as a phone).
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
]


def pii_count(col: Column | str, pattern: str) -> Column:
    return F.size(
        F.regexp_extract_all(_c(col), F.lit(pattern), F.lit(0))
    ).cast("long")


def redact_pii(col: Column | str) -> Column:
    """Sequentially replace every PII match with its placeholder.

    Spark ``regexp_replace`` is replace-all by default; the DuckDB twin
    must pass the ``'g'`` flag for identical semantics.
    """
    out = _c(col)
    for _name, pattern, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, repl)
    return out


def rolling_hash(col_name: str, max_chars: int = 256) -> Column:
    """Polynomial rolling document fingerprint over the first max_chars
    characters: fold acc = (acc*31 + ascii(ch)) % (1e9+7). Portable —
    the DuckDB oracle reproduces the identical fold via list_reduce.

    Takes a column NAME (embedded in a SQL expression string).
    """
    s = f"substring(lower(trim({col_name})), 1, {max_chars})"
    return F.expr(
        f"aggregate(transform(sequence(1, length({s})), "
        f"i -> ascii(substring({s}, i, 1))), 0L, "
        f"(acc, x) -> (acc * 31 + x) % 1000000007)"
    )


# --- HTML / boilerplate stripping (web-corpus curation) -----------------------
# The standard first stage of a CommonCrawl-style text pipeline: drop
# script/style blocks, drop markup tags, decode the common entities,
# collapse whitespace. Pure Catalyst regexp/replace chain (codegen'd,
# no UDF); the DuckDB twin below runs the IDENTICAL pattern sequence so
# cleaned text hashes bit-for-bit in both engines. Patterns stay inside
# the RE2 ∩ Java-regex common subset ((?s) inline flag, non-greedy .*?,
# ASCII \s) — Spark regexp_replace is replace-all by default, DuckDB
# needs the 'g' flag.

# decode &amp; LAST (standard order — decoding it first would
# double-decode strings like '&amp;lt;').
_HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]
_SCRIPT_STYLE_RE = r"(?is)<(script|style)[^>]*>.*?</(script|style)>"
_TAG_RE = r"<[^>]+>"
# Explicit class, NOT \s: Java's \s matches vertical tab (\x0B), RE2's
# does not — with \s a VT in a document collapses in Spark but not in
# the DuckDB twin and the q150 hash gate diverges (found by the r9
# self-review; the explicit class is identical in both engines).
_WS_RE = r"[ \t\n\x0B\f\r]+"


def strip_html(col: Column | str) -> Column:
    """Cleaned visible text of an HTML document column.

    Order matters: script/style bodies go first (their CONTENT must
    vanish, not just their tags), then remaining tags become spaces
    (so '</p><p>' never glues words), then entity decode, then
    whitespace collapse + trim.
    """
    out = F.regexp_replace(_c(col), _SCRIPT_STYLE_RE, " ")
    out = F.regexp_replace(out, _TAG_RE, " ")
    for entity, plain in _HTML_ENTITIES:
        out = F.replace(out, F.lit(entity), F.lit(plain))
    return F.trim(F.regexp_replace(out, _WS_RE, " "))


def strip_html_sql(expr: str) -> str:
    """DuckDB twin of :func:`strip_html` (same pattern sequence; RE2
    accepts the identical regex text; 'g' = replace-all)."""
    out = f"regexp_replace({expr}, '{_SCRIPT_STYLE_RE}', ' ', 'g')"
    out = f"regexp_replace({out}, '{_TAG_RE}', ' ', 'g')"
    for entity, plain in _HTML_ENTITIES:
        lit = plain.replace("'", "''")
        out = f"replace({out}, '{entity}', '{lit}')"
    return f"trim(regexp_replace({out}, '{_WS_RE}', ' ', 'g'))"
