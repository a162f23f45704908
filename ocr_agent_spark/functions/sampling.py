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
