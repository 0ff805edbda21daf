"""URL canonicalization for Common-Crawl-style corpora.

Web-scale crawls see the same page under many spellings of one URL —
case-mangled scheme/host, explicit default ports, tracking query
params, shuffled param order, trailing slashes, fragments.  Grouping
by the raw url string misses all of them; canonicalizing first is the
standard prerequisite for exact URL dedup (the reference keys its
entities on normalized identifiers the same way —
/root/reference/entity_resolution_engine/normalizers/data_normalizer.py).

``canonicalize_url`` is a pure-JVM column expression (regexp extracts
+ array ops — codegen'd, no UDF) with an exact ANSI-SQL twin in the
DuckDB oracle (__spark_entry__.py ``url_canonicalize``), applying, in
order:

1. drop the ``#fragment``;
2. lowercase the scheme and the host;
3. drop an explicit default port (``:80`` for http, ``:443`` for
   https — non-default ports are kept);
4. drop trailing ``/`` runs on the path (``/a/`` → ``/a``, ``/`` → '');
5. drop tracking params (``utm_*``, ``fbclid``, ``gclid``, ``ref``),
   sort the survivors byte-wise, and re-join — param ORDER never
   distinguishes two URLs, tracking params never should.

Inputs that don't parse as ``scheme://authority...`` pass through
unchanged (a crawler's job is to flag those upstream, not lose them).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# one regex, four groups: scheme, authority (host[:port]), path, query
_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)(?:\?([^#]*))?"

TRACKING_PARAM_RE = "^(utm_[a-z]+|fbclid|gclid|ref)="


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` (see module docstring for the exact
    rule set).  Pure JVM expressions; returns the input unchanged when
    it doesn't match ``scheme://authority``."""
    bare = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(bare, _URL_RE, 1))
    host = F.lower(F.regexp_extract(bare, _URL_RE, 2))
    host = F.when(
        scheme == "http", F.regexp_replace(host, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(host, ":443$", "")
    ).otherwise(host)
    path = F.regexp_replace(F.regexp_extract(bare, _URL_RE, 3), "/+$", "")
    query = F.regexp_extract(bare, _URL_RE, 4)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qstr = F.array_join(kept, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qstr != "", F.concat(F.lit("?"), qstr)).otherwise(F.lit("")),
    )
    return F.when(scheme != "", canon).otherwise(url)
