"""PageRank over the host graph — the iterative-algorithm arc.

Common Crawl ships host-level PageRank/harmonic-centrality ranks with
every crawl; pipelines use them as a crawl-priority prior and a
quality signal. This is the repo's representative ITERATIVE
distributed algorithm: a fixed-point loop where each step is a join +
aggregate, materialized per iteration.

Semantics (classic damped PageRank with dangling-mass redistribution):

    rank₀(v)   = 1/N
    rankᵢ(v)   = (1-d)/N + d · ( Σ_{(u,v)∈E} rankᵢ₋₁(u)/outdeg(u)
                                 + dangling_massᵢ₋₁ / N )

where dangling_mass is the total rank sitting on nodes with no
out-edges. Fixed iteration count (default 5) keeps the result a pure
function of the input — replayable in SQL as chained CTEs.

Scale notes (100 TB crawl → ~10⁸ hosts, ~10¹⁰ host edges):
- Each iteration shuffles the slim (src, dst) edge table joined to an
  (node, rank) table — two strings and a double per row; payloads
  never enter the loop.
- The contribution aggregate groups by dst; mega-hosts (everyone
  links to wikipedia) are hot keys collapsed map-side by partial
  aggregation.
- Each round's ranks table is lineage-CUT (``itercut.make_cutter`` —
  the same helper as connected_components / resolve_redirects): a
  round references its predecessor twice (dangling aggregate +
  contribution join), so without a true cut the analyzed plan doubles
  per round — fine at 5 iterations, analyzer blow-up by ~30 on a real
  web graph. Pass ``checkpoint_dir`` on a cluster for the reliable
  variant (survives executor loss; superseded rounds are GC'd).
- The dangling mass is a broadcast 1-row aggregate folded INTO the
  round's plan (crossJoin(broadcast(agg))) — one Spark job per
  iteration, not a separate driver collect + job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def host_pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, rank) after `iterations` damped power-iteration steps.

    `edges` is treated as an unweighted simple digraph (duplicates are
    collapsed). Ranks are rounded to 6 decimals at the END only.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    from ocr_agent_spark.functions.itercut import make_cutter

    cut, gc_superseded = make_cutter(edges.sparkSession, checkpoint_dir)
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))

    ranks = cut(nodes.select("node", (F.lit(1.0) / n).alias("rank")))
    for _ in range(iterations):
        # rank stranded on dangling nodes (no out-edges): a broadcast
        # 1-row aggregate INSIDE the round's plan — the loop's only
        # action per iteration is the eager cut below.
        dangling = (
            ranks.join(deg, ranks["node"] == deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling"))
        )
        contribs = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(deg, "src")
            .select(F.col("dst").alias("node"),
                    (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        new_ranks = cut(
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("_dangling") / n
                    )
                ).alias("rank"),
            )
        )
        ranks = new_ranks
        gc_superseded()

    out = ranks.select("node", F.round("rank", 6).alias("rank"))
    return out


def pagerank_oracle_sql(
    edges_sql: str, iterations: int = 5, damping: float = 0.85
) -> str:
    """ANSI-SQL replay of host_pagerank as chained CTEs, for the
    DuckDB correctness oracle. `edges_sql` must select (src, dst)."""
    d = damping
    ctes = [
        f"edges AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nodes AS (SELECT src AS node FROM edges "
        "UNION SELECT dst FROM edges)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src)",
        "r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        p = f"r{i - 1}"
        ctes.append(
            f"d{i} AS (SELECT COALESCE(SUM(r.rank), 0) AS mass "
            f"FROM {p} r LEFT JOIN deg ON deg.src = r.node "
            f"WHERE deg.src IS NULL)"
        )
        ctes.append(
            f"r{i} AS (SELECT nodes.node, "
            f"(1 - {d}) / (SELECT n FROM nn) + {d} * ("
            f"COALESCE(c.contrib, 0) + "
            f"(SELECT mass FROM d{i}) / (SELECT n FROM nn)) AS rank "
            f"FROM nodes LEFT JOIN ("
            f"SELECT e.dst AS node, SUM(r.rank / deg.outdeg) AS contrib "
            f"FROM edges e JOIN {p} r ON e.src = r.node "
            f"JOIN deg ON deg.src = e.src GROUP BY e.dst) c "
            f"ON c.node = nodes.node)"
        )
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT node, ROUND(rank, 6) AS rank FROM r{iterations}"
    )
