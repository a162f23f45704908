"""Deterministic sampling, mixing, and dataset splitting.

Training-data pipelines never use ``rand()``: a 100 TB sampling job
must give the SAME keep/drop verdict for a row on every run, retry,
and engine (rule D1) — otherwise resume double-samples and nobody can
reproduce a training mix. Everything here derives per-row uniforms
from ``md5(seed || key)``:

- engine-portable (DuckDB computes the identical value → full SQL
  oracles), unlike xxhash64;
- keyed by a STABLE column (url, doc_id), so the verdict follows the
  row, not the partition layout;
- seed-parameterized, so two different samples of the same corpus are
  independent-ish by construction.

All pure projections — no shuffle, no state, no Python.

The classic stages built on it:

- :func:`sample_fraction` — corpus-wide Bernoulli keep.
- :func:`stratified_sample` — per-key fractions (the data-mixing
  primitive: "keep 100% of books, 30% of common-crawl, 5% of
  boilerplate-heavy hosts").
- :func:`split_column` / :func:`split_dataset` — train/val/test
  assignment by cumulative weight over the same uniform, so the splits
  are disjoint, exhaustive, and stable forever.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deterministic_uniform(key: str | Column, seed: str = "42") -> Column:
    """U(0,1) from md5 — first 8 hex chars as a 32-bit int / 2^32.

    32 bits of the digest give ~2.3e-10 resolution — plenty for
    fractions down to 1e-6 — and stay exactly representable in a
    double, so Spark and DuckDB compare identically.
    """
    c = F.col(key) if isinstance(key, str) else key
    h = F.substring(F.md5(F.concat(F.lit(seed + ":"), c.cast("string"))), 1, 8)
    return F.conv(h, 16, 10).cast("double") / F.lit(4294967296.0)


def sample_fraction(docs: DataFrame, fraction: float,
                    key_col: str = "doc_id", seed: str = "42") -> DataFrame:
    """Deterministic Bernoulli sample: keep iff u(key) < fraction."""
    return docs.filter(deterministic_uniform(key_col, seed) < fraction)


def stratified_sample(docs: DataFrame, fractions: dict[str, float],
                      strata_col: str = "source", key_col: str = "doc_id",
                      seed: str = "42",
                      default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum keep fractions — the corpus-mixing primitive.

    A stratum absent from ``fractions`` keeps ``default_fraction``
    (0.0: unlisted sources are dropped — mixing recipes are
    allowlists). The fraction map folds into the plan as a CASE
    expression (recipes are small); rows never shuffle.
    """
    frac = F.lit(float(default_fraction))
    for k, v in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(frac)
    return docs.filter(deterministic_uniform(key_col, seed) < frac)


def split_column(key: str | Column, weights: dict[str, float],
                 seed: str = "split") -> Column:
    """Split-name column from cumulative weights over one uniform.

    ``{"train": 0.9, "val": 0.05, "test": 0.05}`` → each row lands in
    exactly one split, by insertion-independent (sorted-name) cumsum —
    disjoint and exhaustive (the last split absorbs float residue).
    """
    if not weights:
        raise ValueError("split_column: weights must be non-empty")
    if any(v < 0 for v in weights.values()):
        raise ValueError(f"split_column: negative weight in {weights!r}")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError(f"split_column: weights must sum > 0, got {weights!r}")
    u = deterministic_uniform(key, seed)
    names = sorted(weights)
    # nest so the FIRST (smallest-threshold) match wins
    cum = []
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name] / total
        cum.append((name, acc))
    expr = F.lit(names[-1])
    for name, threshold in reversed(cum):
        expr = F.when(u < threshold, F.lit(name)).otherwise(expr)
    return expr


def split_dataset(docs: DataFrame, weights: dict[str, float],
                  key_col: str = "doc_id", seed: str = "split",
                  out_col: str = "split") -> DataFrame:
    """Attach the split assignment column (see :func:`split_column`)."""
    return docs.withColumn(out_col, split_column(key_col, weights, seed))


def shuffle_key(key: str | Column, seed: str = "shuffle") -> Column:
    """Deterministic 128-bit shuffle sort key: md5(seed || key).

    Ordering by it is a reproducible global permutation that follows
    the row (not the partition layout) and is engine-portable — DuckDB
    sorts the identical hex strings, so shard assignments and
    within-shard order replay exactly.
    """
    c = F.col(key) if isinstance(key, str) else key
    return F.md5(F.concat(F.lit(seed + ":"), c.cast("string")))


def corpus_shuffle(docs: DataFrame, key_col: str = "doc_id",
                   seed: str = "shuffle") -> DataFrame:
    """Globally shuffle the corpus into a deterministic pseudo-random
    order — the pre-sharding pass of a training-data pipeline (local
    ordering correlates with crawl order/host otherwise; a global
    shuffle decorrelates batches without a seedable ``rand()``).

    ``orderBy`` on the md5 key IS the scalable formulation: Catalyst
    range-partitions by sampled key quantiles and sorts within
    partitions — a distributed sort with no driver funnel, and because
    md5 keys are uniform the range partitions are balanced by
    construction (no skew regardless of how hot the source ordering
    was). The original key breaks md5-collision ties so the
    permutation is total.
    """
    return docs.orderBy(shuffle_key(key_col, seed).asc(),
                        F.col(key_col).asc())


def shard_assign(docs: DataFrame, n_shards: int, key_col: str = "doc_id",
                 seed: str = "shuffle", out_col: str = "shard") -> DataFrame:
    """Deterministic shard id (0..n_shards-1) from the shuffle key.

    The write-side companion of :func:`corpus_shuffle`: shard by the
    first 32 bits of the md5 key (uniform → balanced shards at any
    scale), order within a shard by the full key. Pure projection —
    the only shuffle is whatever the writer partitions by.
    """
    if n_shards <= 0:
        raise ValueError(f"shard_assign: n_shards must be > 0, got {n_shards}")
    sk = shuffle_key(key_col, seed)
    shard = F.conv(F.substring(sk, 1, 8), 16, 10).cast("long") % n_shards
    return docs.withColumn(out_col, shard.cast("int")) \
        .withColumn("shuffle_key", sk)
