"""URL canonicalization + dedup for web-crawl corpora.

Crawl pipelines (C4, RefinedWeb, FineWeb) dedup by canonical URL before
any content-level pass: it removes the bulk of exact re-crawls for the
price of one string normalization and one hash shuffle on a short key.
The canonicalizer is entirely ``pyspark.sql.functions`` expressions —
JVM-side, whole-stage-codegen, no UDF.

Rules (the common denominator of the crawler folklore):
  scheme/host lowercased, ``www.`` prefix dropped, default ports
  (``:80`` / ``:443``) dropped, fragment dropped, tracking params
  (``utm_*``/``gclid``/``fbclid``/``msclkid``/``ref``) dropped,
  remaining query params sorted, trailing slash on a non-root path
  dropped, missing scheme normalized to https.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING_RE = "^(utm_[a-z]+|gclid|fbclid|msclkid|ref)="


def canonicalize_url(url: Column) -> Column:
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    # authority = up to the first / ? or #; lowercase, default port and
    # www. prefix dropped
    authority = F.regexp_replace(
        F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1)), r":(80|443)$", ""
    )
    authority = F.regexp_replace(authority, r"^www\.", "")
    # path+query, fragment dropped
    tail = F.regexp_replace(F.regexp_replace(rest, r"^[^/?#]*", ""), r"#.*$", "")
    # trailing slash on a non-root path dropped (the lone "/" root and
    # the empty path are left alone)
    path = F.regexp_replace(F.regexp_extract(tail, r"^([^?]*)", 1), r"(.)/$", "$1")
    # tracking params dropped, the rest sorted for a canonical order
    query = F.array_join(
        F.array_sort(
            F.filter(
                F.split(F.regexp_extract(tail, r"\?(.*)$", 1), "&"),
                lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
            )
        ),
        "&",
    )
    norm_scheme = F.when(scheme == "", F.lit("https")).otherwise(scheme)
    return F.concat(
        norm_scheme,
        F.lit("://"),
        authority,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )


def url_dedup(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """Group documents by canonical URL: one row per canonical URL with
    the keeper (smallest id — deterministic) and the group size. One
    map-side canonicalization + ONE hash shuffle on the short canonical
    string; document text never moves."""
    canon = df.select(
        canonicalize_url(F.col(url_col)).alias("canonical_url"), F.col(id_col)
    )
    return canon.groupBy("canonical_url").agg(
        F.min(id_col).alias("keeper_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
