"""Within-document line dedup (functions/linededup.py)."""

import duckdb
import pytest

from ocr_agent_spark.functions.linededup import (
    dedup_lines, dedup_lines_column, dedup_lines_exploded,
)

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "Cookie notice\nreal content\nCookie notice\nmore content"),
        (1, "a\n\nb\n\na\nb"),              # blanks always survive
        (2, "Heading\n  heading  \nHEADING"),  # trim+case normalized
        (3, "single line"),
        (4, ""),
        (5, "x\ny\nz"),                      # nothing repeated
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


EXPECTED = {
    0: "Cookie notice\nreal content\nmore content",
    1: "a\n\nb\n",  # kept [a, '', b, ''] joined by 3 separators
    2: "Heading",
    3: "single line",
    4: "",
    5: "x\ny\nz",
}


def test_first_occurrence_semantics(spark, docs):
    got = {
        r["doc_id"]: r["out"]
        for r in docs.select(
            "doc_id", dedup_lines_column(F.col("text")).alias("out")
        ).collect()
    }
    assert got == EXPECTED


def test_accounting_columns(spark, docs):
    rows = {r["doc_id"]: r for r in dedup_lines(docs).collect()}
    assert rows[0]["n_lines"] == 4 and rows[0]["n_lines_kept"] == 3
    assert rows[5]["n_lines"] == 3 and rows[5]["n_lines_kept"] == 3


def test_exploded_variant_matches_projection(spark, docs):
    a = {
        r["doc_id"]: r["text_deduped"]
        for r in dedup_lines(docs).collect()
    }
    b = {
        r["doc_id"]: r["text_deduped"]
        for r in dedup_lines_exploded(docs).collect()
    }
    assert a == b


def test_projection_plan_is_shuffle_free(spark, docs):
    plan = docs.select(
        dedup_lines_column(F.col("text")).alias("out")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_duckdb_replay(spark, docs):
    sdf = (
        dedup_lines(docs)
        .select("doc_id", "text_deduped", "n_lines", "n_lines_kept")
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    odf = con.execute(r"""
        WITH lines AS (
          SELECT doc_id, i, w[i] AS line, lower(trim(w[i])) AS key
          FROM (
            SELECT doc_id, string_split(text, chr(10)) AS w FROM documents
          ), unnest(generate_series(1, len(w))) AS t(i)
        ), kept AS (
          SELECT doc_id, i, line FROM (
            SELECT doc_id, i, line, key,
                   row_number() OVER (PARTITION BY doc_id, key
                                      ORDER BY i) AS rn
            FROM lines
          ) WHERE key = '' OR rn = 1
        )
        SELECT d.doc_id,
               COALESCE(k.txt, d.text) AS text_deduped,
               len(string_split(d.text, chr(10))) AS n_lines,
               len(string_split(COALESCE(k.txt, d.text), chr(10)))
                   AS n_lines_kept
        FROM documents d LEFT JOIN (
          SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS txt
          FROM kept GROUP BY doc_id
        ) k ON k.doc_id = d.doc_id
        ORDER BY d.doc_id
    """).df()
    assert list(sdf["doc_id"]) == list(odf["doc_id"])
    assert list(sdf["text_deduped"]) == list(odf["text_deduped"])
    assert list(sdf["n_lines"]) == list(odf["n_lines"])
    assert list(sdf["n_lines_kept"]) == list(odf["n_lines_kept"])
