"""Host-skew handling: url-hash bucketing with explicit salting (north star).

A web crawl's partition-killer is the mega-host: one domain holding a
double-digit share of all pages. Hash-partitioning by URL already
spreads *documents* evenly (the extraction default), but any stage
keyed by HOST — per-host aggregation, politeness grouping, host-level
dedup — collapses a mega-host onto one task. The toolkit here makes
the skew handling explicit, per the north star's "bucketed by url-hash
with explicit salting of skewed hosts":

- :func:`url_host`            — host extraction as a JVM regex (oracle-
                                 expressible; no java.net.URL per row).
- :func:`detect_skewed_keys`  — one aggregate pass → keys whose row
                                 count exceeds a cap. The collected list
                                 is small by construction (only keys
                                 above cap); at 10^12 docs it is the
                                 handful of mega-hosts.
- :func:`salted_repartition`  — partition by (key, salt) where salt ≠ 0
                                 only for the skewed keys: normal keys
                                 keep plain hash placement, mega-host
                                 rows fan out over ``salt_buckets``
                                 partitions deterministically
                                 (xxhash64 of the row's unique columns).

The *aggregation* side of the same problem (two-phase salted groupBy)
lives in ``operators/metrics.py`` (``salted_host_counts`` +
``heavy_hitter_hosts``); AQE's skew-join splitting covers the join
side. This module adds the PLACEMENT primitive those don't: balancing
the physical partitions a skewed key's rows land on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"


def url_host(url: str | Column) -> Column:
    """Host of a URL (lowercased), '' when the URL has no authority."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(c, _HOST_RE, 1))


def detect_skewed_keys(df: DataFrame, key: Column, max_rows_per_key: int) -> list:
    """Keys with more rows than ``max_rows_per_key`` (one shuffle, tiny
    result: only the offenders come back to the driver)."""
    rows = (
        df.select(key.alias("_k"))
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_rows_per_key)
        .select("_k")
        .collect()
    )
    return [r["_k"] for r in rows]


def _salt(df_cols: list[str], salt_buckets: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in df_cols]), F.lit(salt_buckets))


def salted_repartition(df: DataFrame, key: Column, unique_cols: list[str],
                       num_partitions: int, salt_buckets: int = 16,
                       max_rows_per_key: int | None = None,
                       skewed_keys: list | None = None) -> DataFrame:
    """Repartition by (key, salt): plain hash for normal keys, fan-out
    over ``salt_buckets`` for skewed ones.

    ``skewed_keys`` can be passed from a prior :func:`detect_skewed_keys`
    (or a known mega-host list); otherwise it is detected with
    ``max_rows_per_key``. The salt derives from ``unique_cols`` (e.g.
    url + page_index), so placement stays deterministic row-for-row —
    reruns produce identical partition contents (design rule D1).
    """
    if skewed_keys is None:
        if max_rows_per_key is None:
            raise ValueError("pass skewed_keys or max_rows_per_key")
        skewed_keys = detect_skewed_keys(df, key, max_rows_per_key)
    if not skewed_keys:
        return df.repartition(num_partitions, key)
    salt = F.when(
        key.isin(skewed_keys), _salt(unique_cols, salt_buckets)
    ).otherwise(F.lit(0))
    return df.repartition(num_partitions, key, salt)


def surt_key(url: str | Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) of a URL — the
    Common-Crawl canonical key: ``com,example)/path``.

    Reversing the host labels makes one *domain's* pages a contiguous
    key RANGE, so range-partitioning / sorting by SURT co-locates a
    site (politeness grouping, per-site dedup, prefix pruning of a
    whole TLD) — the property a plain url sort lacks. Canonicalization
    applied (cdx-toolkit-compatible subset): lowercase, scheme and
    userinfo dropped, leading ``www.`` dropped, default ports :80/:443
    dropped, fragment dropped, empty path → ``/``.

    Pure JVM regexp/split/reverse chain — engine-portable, replayed
    verbatim in the DuckDB oracle (``surt_keys`` query).
    """
    c = F.col(url) if isinstance(url, str) else url
    low = F.lower(c)
    rest = F.regexp_replace(low, r"^[a-z][a-z0-9+.-]*://", "")
    rest = F.regexp_replace(rest, r"^[^/@?#]*@", "")   # userinfo
    rest = F.regexp_replace(rest, r"#.*$", "")          # fragment
    rest = F.regexp_replace(rest, r"^www\.", "")
    host = F.regexp_extract(rest, r"^([^/?]*)", 1)
    host = F.regexp_replace(host, r":(80|443)$", "")
    path = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    # a non-default port stays, AFTER the reversed labels (SURT form
    # com,example:8080) — it must not ride along inside the last label
    port = F.regexp_extract(host, r"(:\d+)$", 1)
    bare = F.regexp_replace(host, r":\d+$", "")
    rev = F.array_join(F.reverse(F.split(bare, r"\.")), ",")
    return F.concat(rev, port, F.lit(")"), path)
