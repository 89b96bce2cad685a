"""ClickHouse URL-function family as NATIVE Spark expressions.

The reference's users run ClickHouse's URL functions (``domain``,
``topLevelDomain``, ``path``, ``queryString``, ``cutQueryString``,
``extractURLParameter``, ``port`` — docs/en/sql-reference/functions/
url-functions) over log columns; this module re-expresses each as a
pure `pyspark.sql.functions` Column so the whole family stays inside
whole-stage codegen — no UDF, no Python on the hot path.

Semantics follow CH's RFC-3986-"lite" parser:

- ``protocol``: scheme without the ``://``.
- ``domain``: host with the port stripped; empty string when the input
  has no authority (CH returns '' rather than NULL).  Credentials
  (``user:pass@``) are skipped.  Scheme-relative ``//host/...`` URLs
  are accepted, matching CH.
- ``domainWithoutWWW``: ``domain`` minus one leading ``www.``.
- ``topLevelDomain``: the label after the LAST dot of the domain (CH
  without a public-suffix list — ``co.uk`` yields ``uk``); the last
  label unconditionally unless the host is empty, numeric labels pass
  through.
- ``path``: from the first ``/`` after the authority up to but not
  including ``?`` or ``#``; '' when the URL has an authority but no
  path.
- ``queryString``: between ``?`` and ``#``/end, WITHOUT the ``?``.
- ``cutQueryString``: the URL with ``?query`` removed, fragment kept
  (CH has a separate ``cutQueryStringAndFragment``).
- ``extractURLParameter(url, name)``: first ``name=value`` occurrence's
  value, '' when the parameter is absent or bare (CH convention).
- ``port(url, default)``: explicit ``:NNN`` port cast to int, else the
  caller's default (CH defaults to 0).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# authority = everything between '//' and the first of '/?#', with an
# optional 'user:pass@' prefix skipped.  Scheme is optional so
# protocol-relative URLs parse.
_AUTH = r"^(?:[A-Za-z][A-Za-z0-9+.-]*:)?//(?:[^/?#@]*@)?([^/?#]*)"


def _c(url: str | Column) -> Column:
    return F.col(url) if isinstance(url, str) else url


def protocol(url: str | Column) -> Column:
    """Scheme without the separator: ``https`` for ``https://…``."""
    return F.regexp_extract(_c(url), r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)


def domain(url: str | Column) -> Column:
    """Host with credentials and port stripped; '' when no authority."""
    auth = F.regexp_extract(_c(url), _AUTH, 1)
    return F.regexp_extract(auth, r"^([^:]*)", 1)


def domain_without_www(url: str | Column) -> Column:
    d = domain(url)
    return F.when(
        d.startswith("www."), F.substring(d, 5, 1 << 30)
    ).otherwise(d)


def top_level_domain(url: str | Column) -> Column:
    """Label after the last dot of the domain (CH without PSL)."""
    d = domain(url)
    return F.when(d == "", F.lit("")).otherwise(
        F.element_at(F.split(d, r"\."), -1)
    )


def url_path(url: str | Column) -> Column:
    """Path component: first '/' after the authority to '?'/'#'."""
    c = _c(url)
    # strip scheme+authority when present; otherwise the path starts
    # at the beginning (lenient, like CH on authority-less inputs)
    rest = F.regexp_replace(
        c, r"^(?:[A-Za-z][A-Za-z0-9+.-]*:)?//(?:[^/?#@]*@)?[^/?#]*", ""
    )
    return F.regexp_extract(rest, r"^([^?#]*)", 1)


def query_string(url: str | Column) -> Column:
    """Between '?' and '#'/end, without the '?'."""
    return F.regexp_extract(_c(url), r"\?([^#]*)", 1)


def cut_query_string(url: str | Column) -> Column:
    """URL with '?query' removed; fragment preserved (CH semantics)."""
    return F.regexp_replace(_c(url), r"\?[^#]*", "")


def extract_url_parameter(url: str | Column, name: str) -> Column:
    """First ``name=value`` value in the query string, '' if absent."""
    import re as _re

    pat = r"[?&]" + _re.escape(name) + r"=([^&#]*)"
    return F.regexp_extract(_c(url), pat, 1)


def url_port(url: str | Column, default: int = 0) -> Column:
    auth = F.regexp_extract(_c(url), _AUTH, 1)
    p = F.regexp_extract(auth, r":(\d+)$", 1)
    return F.when(p == "", F.lit(default)).otherwise(
        p.cast("int")
    )


# CH's compiled heuristic set: a second-to-last label in this set means
# the registrable name sits one level deeper (news.clickhouse.com.tr ->
# 'clickhouse').  CH proper consults a compiled TLD list; this is the
# documented com/net/org/co core of it (docs example set), public-suffix
# refinements out of scope.
_SECOND_LEVEL_TLDS = ("com", "net", "org", "co")


def first_significant_subdomain(url: str | Column) -> Column:
    """CH ``firstSignificantSubdomain``: the label left of the effective
    TLD — the third-from-last label when the second-from-last is in
    {com, net, org, co}, else the second-from-last; the whole host when
    it has a single label; '' for empty authority."""
    host = domain(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    deep = F.try_element_at(parts, F.lit(-2)).isin(*_SECOND_LEVEL_TLDS) & (n >= 3)
    return (
        F.when(host == "", F.lit(""))
        .when(deep, F.try_element_at(parts, F.lit(-3)))
        .when(n >= 2, F.try_element_at(parts, F.lit(-2)))
        .otherwise(host)
    )


def cut_to_first_significant_subdomain(url: str | Column) -> Column:
    """CH ``cutToFirstSignificantSubdomain``: the host truncated to
    start at the first significant subdomain (``news.clickhouse.com.tr``
    -> ``clickhouse.com.tr``); '' for empty authority."""
    host = domain(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    deep = F.try_element_at(parts, F.lit(-2)).isin(*_SECOND_LEVEL_TLDS) & (n >= 3)
    keep = F.when(deep, F.lit(3)).otherwise(F.least(n, F.lit(2)))
    return F.when(host == "", F.lit("")).otherwise(
        F.array_join(F.slice(parts, n - keep + 1, keep), ".")
    )
