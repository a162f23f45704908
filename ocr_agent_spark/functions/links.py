"""Web-graph extraction: pages → edge table → host graph.

The pipeline's graph product (Common Crawl publishes exactly these two
tables per crawl). The page-level pass is Arrow-batched Python (the
href kernel needs real attribute parsing); everything AFTER the edges
exist — host projection, degree counts, the host-graph aggregation —
is pure JVM over the slim (src, dst) table. Payloads are read once and
never shuffled; the edge table is what moves, and it is two strings a
row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EDGES_DDL = "src string, dst string"

_OUT_BATCH_ROWS = 4096


def extract_link_edges(pages: DataFrame, url_col: str = "url",
                       html_col: str = "html") -> DataFrame:
    """(url, html) pages → (src, dst) edge rows (order-deduped per page)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_agent_spark.kernel.links import extract_links

        for batch in batches:
            rows: dict[str, list] = {"src": [], "dst": []}
            for url, html in zip(batch[url_col], batch[html_col]):
                if html is None or url is None:
                    continue  # no page, or no src to anchor the edge to
                for dst in extract_links(bytes(html), url):
                    rows["src"].append(url)
                    rows["dst"].append(dst)
                    if len(rows["src"]) >= _OUT_BATCH_ROWS:
                        yield pd.DataFrame(rows)
                        rows = {"src": [], "dst": []}
            if rows["src"]:
                yield pd.DataFrame(rows)

    return pages.select(url_col, html_col).mapInPandas(run, EDGES_DDL)


def host_graph(edges: DataFrame) -> DataFrame:
    """Edge table → host-level graph: (src_host, dst_host, n_links),
    excluding intra-host self-loops — the Common-Crawl host-graph shape.
    Pure JVM: two host projections + one aggregation."""
    from ocr_agent_spark.operators.skew import url_host

    return (
        edges.select(
            url_host(F.col("src")).alias("src_host"),
            url_host(F.col("dst")).alias("dst_host"),
        )
        .filter(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


ANCHOR_EDGES_DDL = "src string, dst string, anchor string"


def extract_anchor_edges(pages: DataFrame, url_col: str = "url",
                         html_col: str = "html") -> DataFrame:
    """(url, html) pages → (src, dst, anchor) rows — the edge table
    WITH anchor text (Common Crawl's WAT/anchor product). Same batch
    discipline as extract_link_edges: payloads are read once in the
    Arrow batch and never shuffled; only the three-string edge row
    moves."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_agent_spark.kernel.links import extract_anchors

        for batch in batches:
            rows: dict[str, list] = {"src": [], "dst": [], "anchor": []}
            for url, html in zip(batch[url_col], batch[html_col]):
                if html is None or url is None:
                    continue  # no page, or no src to anchor the edge to
                for dst, anchor in extract_anchors(bytes(html), url):
                    rows["src"].append(url)
                    rows["dst"].append(dst)
                    rows["anchor"].append(anchor)
                    if len(rows["src"]) >= _OUT_BATCH_ROWS:
                        yield pd.DataFrame(rows)
                        rows = {"src": [], "dst": [], "anchor": []}
            if rows["src"]:
                yield pd.DataFrame(rows)

    return pages.select(url_col, html_col).mapInPandas(run, ANCHOR_EDGES_DDL)


def top_anchor_texts(anchor_edges: DataFrame, k: int = 1) -> DataFrame:
    """Per-target anchor-text consensus: for each dst url, the k most
    common non-empty anchor strings — (dst, anchor, n_refs, rank).

    This is how a pipeline derives a page's "community title" (what
    the web CALLS the page, independent of its own <title>). Pure JVM:
    one aggregation + one bounded window. Scale: groups are per (dst,
    anchor) — mega-targets (everyone links to the same homepage) are
    hot keys handled by partial aggregation; the rank window
    partitions per dst, so no task sorts more than one target's
    distinct anchor strings. Ties break lexicographically — the output
    is a pure function of the edge multiset."""
    from pyspark.sql import Window

    counted = (
        anchor_edges.filter(F.col("anchor") != "")
        .groupBy("dst", "anchor")
        .agg(F.count(F.lit(1)).alias("n_refs"))
    )
    w = Window.partitionBy("dst").orderBy(
        F.col("n_refs").desc(), F.col("anchor").asc()
    )
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
