"""URL structure functions — host extraction and registered-domain
grouping, the keys a web-corpus pipeline partitions by (per-domain crawl
budgets, domain-level dedup/quality, robots grouping). The reference only
string-manipulates THREDDS urls (input.py:105-125, stac_utils.py:299-312);
a Common-Crawl-scale corpus needs the general forms.

Everything is a JVM column expression (regexp_extract chains — RE2-safe
patterns so the DuckDB oracle mirrors them verbatim); no UDFs, stays in
codegen, and ``registered_domain`` is a safe shuffle/groupBy key at any
corpus size (bounded cardinality ~10^8 ≪ urls).
"""

from __future__ import annotations

from pyspark.sql import functions as F

# authority = after scheme://, optional userinfo@, up to :port / path / query
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)"

# common two-level public suffixes: the registered domain is one label
# deeper for these (a pragmatic subset of the Public Suffix List — the
# full PSL is data a deployment can broadcast-join instead)
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "co.in", "co.nz", "co.za", "com.br", "com.mx", "com.cn", "com.sg",
)

_LAST2 = r"([^.]+\.[^.]+)$"
_LAST3 = r"([^.]+\.[^.]+\.[^.]+)$"


def url_host(url) -> F.Column:
    """Lower-cased authority host (userinfo/port/path/query stripped)."""
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def registered_domain(host) -> F.Column:
    """Registrable domain: last two labels, or last three when the
    two-label tail is a known two-level public suffix (news.bbc.co.uk →
    bbc.co.uk; a.b.example.com → example.com)."""
    last2 = F.regexp_extract(host, _LAST2, 1)
    last3 = F.regexp_extract(host, _LAST3, 1)
    return F.when(
        last2.isin(*TWO_LEVEL_SUFFIXES) & (F.length(last3) > 0), last3
    ).otherwise(last2)


def url_registered_domain(url) -> F.Column:
    return registered_domain(url_host(url))
