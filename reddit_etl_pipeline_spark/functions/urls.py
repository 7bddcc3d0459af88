"""URL canonicalization + domain-level curation primitives.

The standard training-data stage (C4, RefinedWeb, Gopher all filter at
the domain level) the engine needed over its URL surface (the
reference's 13-field projection carries a raw ``url`` column,
`extract-from-reddit.py:208-212` / SURVEY §1.2 row 7): canonicalize
messy URLs so that textually-different spellings of the same resource
collapse, extract the registrable-ish domain, roll corpora up per
domain, and enforce blocklists / per-domain caps during curation.

Everything here is pure codegen string work — ``regexp_extract`` /
``regexp_replace`` / ``lower`` / ``concat`` — no UDFs, no HOF lambdas,
map-side only (the cheapest possible 100 TB shape: the canonical URL is
a per-row function, so it rides any existing scan). Every rule is
mirrored token-for-token by the DuckDB replays below (the
QUALITY_EXPR_SQL single-sourcing convention): Spark's regexp_replace
replaces ALL matches, DuckDB's only the FIRST without the 'g' flag, so
the SQL side passes 'g' explicitly; both engines' regexp_extract
return '' for a non-participating group.

Canonicalization matrix (applied in this order):

1. trim surrounding whitespace;
2. scheme lowercased;
3. host[:port] lowercased;
4. default port stripped (``:80`` for http, ``:443`` for https —
   non-default ports are kept);
5. fragment (``#...``) dropped;
6. tracking parameters removed from the query string (``utm_*``,
   ``gclid``, ``fbclid``, ``ref``, ``mc_cid``, ``mc_eid``), the ``?``
   dropped when the query empties;
7. empty path normalized to ``/``.

``url_domain`` additionally strips any port and a leading ``www.``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "TRACKING_PARAMS",
    "canonicalize_url",
    "url_domain",
    "domain_rollup",
    "canonical_url_sql",
    "url_domain_sql",
]

#: query parameters removed during canonicalization (regex alternation,
#: valid in both Java regex and RE2)
TRACKING_PARAMS = "utm_[^=&]*|gclid|fbclid|ref|mc_cid|mc_eid"

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"


def _parts(col: Column):
    """Shared decomposition: (scheme, hostport, path, query) columns."""
    u = F.trim(col)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    nofrag = F.regexp_replace(rest, "#.*$", "")
    hostport = F.lower(F.regexp_extract(nofrag, "^([^/?]*)", 1))
    pathq = F.regexp_extract(nofrag, "^[^/?]*([/?].*)?$", 1)
    path = F.regexp_extract(pathq, "^([^?]*)", 1)
    query = F.regexp_extract(pathq, "^[^?]*\\?(.*)$", 1)
    return scheme, hostport, path, query


def canonicalize_url(col: str | Column = "url") -> Column:
    """The canonical form of a URL column under the module's matrix —
    one map-side expression tree, no shuffle, no Python."""
    c = F.col(col) if isinstance(col, str) else col
    scheme, hostport, path, query = _parts(c)
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    # drop tracking params: prefix '&' so every param matches uniformly,
    # strip the artificial leading '&' afterwards
    qclean = F.regexp_replace(
        F.regexp_replace(
            F.concat(F.lit("&"), query),
            f"&({TRACKING_PARAMS})=[^&]*",
            "",
        ),
        "^&",
        "",
    )
    path_norm = F.when(path == "", F.lit("/")).otherwise(path)
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path_norm,
        F.when(qclean == "", F.lit("")).otherwise(F.concat(F.lit("?"), qclean)),
    )


def url_domain(col: str | Column = "url") -> Column:
    """The rollup/blocklist key: lowercased hostname, any port removed,
    a leading ``www.`` stripped."""
    c = F.col(col) if isinstance(col, str) else col
    _, hostport, _, _ = _parts(c)
    return F.regexp_replace(
        F.regexp_extract(hostport, "^([^:]*)", 1), "^www\\.", ""
    )


def domain_rollup(
    docs: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Per-domain corpus profile — the read behind domain blocklists and
    caps: (domain, n_docs, n_urls, n_tokens, mean_quality_micro) where
    n_urls counts DISTINCT canonical URLs (spelling variants of one
    resource collapse), n_tokens sums whitespace tokens, and the mean
    quality is an exact integer division of summed quality micros (the
    engine's half-up micro convention). One canonical-URL projection +
    one two-level aggregate; all map-side-combinable."""
    from .text import quality_score, token_count

    base = docs.select(
        url_domain(url_col).alias("domain"),
        canonicalize_url(url_col).alias("curl"),
        token_count(text_col).cast("long").alias("n_toks"),
        F.round(quality_score(text_col) * 1e6).cast("long").alias("q_micro"),
    )
    return (
        base.groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("curl").alias("n_urls"),
            F.sum("n_toks").alias("n_tokens"),
            F.expr("sum(q_micro) div count(1)").alias("mean_quality_micro"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB replays (single-sourced mirrors of the expressions above)
# ---------------------------------------------------------------------------


def _parts_sql(expr: str) -> tuple[str, str, str, str]:
    u = f"trim({expr})"
    scheme = f"lower(regexp_extract({u}, '{_SCHEME_RE}', 1))"
    rest = f"regexp_replace({u}, '{_SCHEME_RE}', '', 'g')"
    nofrag = f"regexp_replace({rest}, '#.*$', '', 'g')"
    hostport = f"lower(regexp_extract({nofrag}, '^([^/?]*)', 1))"
    pathq = f"regexp_extract({nofrag}, '^[^/?]*([/?].*)?$', 1)"
    path = f"regexp_extract({pathq}, '^([^?]*)', 1)"
    query = f"regexp_extract({pathq}, '^[^?]*\\?(.*)$', 1)"
    return scheme, hostport, path, query


def canonical_url_sql(expr: str) -> str:
    """DuckDB expression equal to ``canonicalize_url(expr)``."""
    scheme, hostport, path, query = _parts_sql(expr)
    host = (
        f"CASE WHEN {scheme} = 'http' THEN "
        f"regexp_replace({hostport}, ':80$', '', 'g') "
        f"WHEN {scheme} = 'https' THEN "
        f"regexp_replace({hostport}, ':443$', '', 'g') "
        f"ELSE {hostport} END"
    )
    qclean = (
        f"regexp_replace(regexp_replace('&' || {query}, "
        f"'&({TRACKING_PARAMS})=[^&]*', '', 'g'), '^&', '', 'g')"
    )
    return (
        f"({scheme} || '://' || ({host}) || "
        f"(CASE WHEN {path} = '' THEN '/' ELSE {path} END) || "
        f"(CASE WHEN {qclean} = '' THEN '' ELSE '?' || {qclean} END))"
    )


def url_domain_sql(expr: str) -> str:
    """DuckDB expression equal to ``url_domain(expr)``."""
    _, hostport, _, _ = _parts_sql(expr)
    return (
        f"regexp_replace(regexp_extract({hostport}, '^([^:]*)', 1), "
        f"'^www\\.', '', 'g')"
    )
