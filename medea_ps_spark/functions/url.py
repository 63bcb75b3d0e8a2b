"""URL canonicalization — the dedup stage web-scale corpora run BEFORE
any text comparison: the same page is typically crawled under dozens of
URL spellings (scheme/host case, default ports, fragments, tracking
parameters, trailing slashes). Everything here is pure
``pyspark.sql.functions`` regex/array expressions — whole-stage
codegen, no UDF, and every regex has a 1:1 ANSI-SQL twin so the
operators stay DuckDB-oracle-able.

The registered-domain helper uses a small embedded multi-part-suffix
table (the common ccSLDs), NOT the full Public Suffix List — documented
tradeoff: exotic suffixes fall back to the last-two-labels heuristic.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: query parameters that identify a CLICK, not a page — dropped during
#: normalization (Google/Facebook/Microsoft click ids + utm_* campaign
#: tags + common referrer tags)
TRACKING_PARAM_RE = r"^(utm_[a-z]+|gclid|gbraid|wbraid|fbclid|msclkid|mc_eid|mc_cid|igshid|ref|ref_src|spm|_ga)$"

#: common multi-label public suffixes (subset of the PSL; the long tail
#: falls back to last-two-labels)
MULTI_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "co.za", "com.tr", "com.ar", "com.sg", "co.nz",
]


def url_scheme(col: Column) -> Column:
    """Lowercased scheme; NULL when the value has none."""
    s = F.regexp_extract(col, r"^\s*([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    return F.when(s == "", F.lit(None).cast("string")).otherwise(F.lower(s))


def url_host(col: Column) -> Column:
    """Lowercased host (userinfo and port stripped); NULL when the value
    doesn't parse as scheme://host..."""
    h = F.regexp_extract(
        col, r"^\s*[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1
    )
    return F.when(h == "", F.lit(None).cast("string")).otherwise(F.lower(h))


def url_path(col: Column) -> Column:
    """Path component ('' → '/'): everything between the authority and
    the first ``?`` or ``#``."""
    p = F.regexp_extract(
        col, r"^\s*[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_query(col: Column) -> Column:
    """Raw query string WITHOUT the '?' ('' when absent)."""
    return F.regexp_extract(col, r"\?([^#]*)", 1)


def registered_domain(host: Column) -> Column:
    """eTLD+1-ish: last two labels, or last THREE when the last two are
    a known multi-label suffix (co.uk, com.au, ...). Input should be the
    output of :func:`url_host`."""
    last2 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    last3 = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    is_multi = last2.isin(MULTI_SUFFIXES)
    out = F.when(is_multi & (last3 != ""), last3).otherwise(last2)
    return F.when(host.isNull() | (out == ""), F.lit(None).cast("string")).otherwise(out)


def normalize_url(col: Column, keep_query: bool = True) -> Column:
    """Canonical URL for dedup keys:

    * scheme + host lowercased; userinfo dropped
    * default ports stripped (http:80 / https:443); other ports kept
    * fragment dropped
    * tracking params dropped (:data:`TRACKING_PARAM_RE`); the remaining
      query pairs SORTED so param order doesn't split duplicates;
      ``keep_query=False`` drops the query entirely
    * trailing slash trimmed from non-root paths

    NULL / unparseable input → NULL. Pure expressions end-to-end
    (regexp + split/filter/array_sort/array_join).
    """
    scheme = url_scheme(col)
    host = url_host(col)
    port = F.regexp_extract(
        col, r"^\s*[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?[^/:?#]+:(\d+)", 1
    )
    is_default = (
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    portpart = F.when(is_default, F.lit("")).otherwise(F.concat(F.lit(":"), port))
    path = url_path(col)
    # trim trailing slashes, keep root as '/'
    path = F.regexp_replace(path, r"(.)/+$", "$1")
    if keep_query:
        q = url_query(col)
        pairs = F.filter(
            F.split(q, "&"),
            lambda p: (p != "")
            & ~F.regexp_extract(p, r"^([^=]*)", 1).rlike(TRACKING_PARAM_RE),
        )
        qnorm = F.array_join(F.array_sort(pairs), "&")
        querypart = F.when(qnorm == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), qnorm)
        )
    else:
        querypart = F.lit("")
    out = F.concat(scheme, F.lit("://"), host, portpart, path, querypart)
    return F.when(scheme.isNull() | host.isNull(), F.lit(None).cast("string")).otherwise(out)


def url_dedup_key(col: Column, keep_query: bool = True) -> Column:
    """16-byte dedup fingerprint of the canonical URL (md5 hex — the
    house cross-engine-stable hash). NULL URL → NULL key."""
    return F.md5(normalize_url(col, keep_query))
