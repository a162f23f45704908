"""DSIR importance resampling (functions/dsir.py)."""

import duckdb
import pytest

from ocr_agent_spark.functions.dsir import (
    dsir_log_weights, dsir_sample_keys, dsir_topk,
    hashed_ngram_bucket_counts,
)


@pytest.fixture(scope="module")
def corpora(spark):
    # target: math-y docs; raw: a mix of math-y and cooking docs plus
    # an empty one.
    target = spark.createDataFrame(
        [
            (100, "theorem proof lemma theorem algebra"),
            (101, "proof integral theorem calculus"),
        ],
        "doc_id long, text string",
    )
    # raw docs carry enough tokens that the log-weight spread dominates
    # the Gumbel noise (std ~1.28) — otherwise top-k is a coin flip.
    raw = spark.createDataFrame(
        [
            (0, "theorem proof algebra lemma " * 4),
            (1, "recipe butter flour sugar oven " * 4),
            (2, "integral calculus proof theorem lemma " * 4),
            (3, "oven butter recipe sugar flour salt " * 4),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    return raw, target


def test_bucket_counts_deterministic_and_complete(spark, corpora):
    raw, _ = corpora
    a = hashed_ngram_bucket_counts(raw).collect()
    b = hashed_ngram_bucket_counts(raw).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # doc 0: 16 unigrams + 15 bigrams = 31 total token occurrences
    per_doc = {}
    for r in a:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["c"]
    assert per_doc[0] == 31
    assert 4 not in per_doc  # empty doc has no tokens


def test_target_like_docs_outweigh_off_target(spark, corpora):
    raw, target = corpora
    w = {r["doc_id"]: r["log_weight"]
         for r in dsir_log_weights(raw, target).collect()}
    assert set(w) == {0, 1, 2, 3, 4}
    assert w[4] == 0.0  # token-less doc kept at weight 0
    # math docs must dominate cooking docs
    assert min(w[0], w[2]) > max(w[1], w[3])


def test_topk_selects_target_like(spark, corpora):
    # A zero-token doc scores log-weight 0, which sits ABOVE every
    # token-bearing doc (Σ count·log-ratio is length-scaled negative
    # for small smoothed corpora) — real pipelines gate empties with a
    # length filter first, so this test does too.
    from pyspark.sql import functions as F

    raw, target = corpora
    nonempty = raw.filter(F.length("text") > 0)
    top = [r["doc_id"] for r in dsir_topk(nonempty, target, k=2).collect()]
    assert set(top) == {0, 2}


def test_sample_keys_deterministic(spark, corpora):
    raw, target = corpora
    a = dsir_sample_keys(raw, target).collect()
    b = dsir_sample_keys(raw, target).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_matches_duckdb_replay(spark, corpora):
    """Full engine replay: tokenize→hash→distributions→micros→gumbel."""
    raw, target = corpora
    sdf = (
        dsir_sample_keys(raw, target, n_buckets=64)
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("raw", raw.toPandas())
    con.register("tgt", target.toPandas())
    odf = con.execute(r"""
        WITH wt_r AS (
          SELECT doc_id, list_filter(
            regexp_split_to_array(trim(lower(text)), '\s+'),
            x -> x <> '') AS w FROM raw
        ), toks_r AS (
          SELECT doc_id, unnest(w) AS tok FROM wt_r
          UNION ALL
          SELECT doc_id, w[i] || ' ' || w[i + 1]
          FROM wt_r, unnest(generate_series(1, len(w) - 1)) AS t(i)
          WHERE len(w) >= 2
        ), cnt_r AS (
          SELECT doc_id,
            CAST(concat('0x', substring(md5('dsir:' || tok), 1, 8))
                 AS BIGINT) % 64 AS bucket,
            COUNT(*) AS c
          FROM toks_r GROUP BY 1, 2
        ), wt_t AS (
          SELECT doc_id, list_filter(
            regexp_split_to_array(trim(lower(text)), '\s+'),
            x -> x <> '') AS w FROM tgt
        ), toks_t AS (
          SELECT doc_id, unnest(w) AS tok FROM wt_t
          UNION ALL
          SELECT doc_id, w[i] || ' ' || w[i + 1]
          FROM wt_t, unnest(generate_series(1, len(w) - 1)) AS t(i)
          WHERE len(w) >= 2
        ), cnt_t AS (
          SELECT doc_id,
            CAST(concat('0x', substring(md5('dsir:' || tok), 1, 8))
                 AS BIGINT) % 64 AS bucket,
            COUNT(*) AS c
          FROM toks_t GROUP BY 1, 2
        ), dist_t AS (SELECT bucket, SUM(c) AS cb FROM cnt_t GROUP BY 1),
        dist_r AS (SELECT bucket, SUM(c) AS cb FROM cnt_r GROUP BY 1),
        grid AS (SELECT CAST(i AS BIGINT) AS bucket
                 FROM unnest(range(64)) AS g(i)),
        j AS (
          SELECT grid.bucket, COALESCE(dt.cb, 0) AS ct,
                 COALESCE(dr.cb, 0) AS cr
          FROM grid LEFT JOIN dist_t dt ON dt.bucket = grid.bucket
                    LEFT JOIN dist_r dr ON dr.bucket = grid.bucket
        ), tot AS (SELECT SUM(ct) AS tot_t, SUM(cr) AS tot_r FROM j),
        micro AS (
          SELECT bucket,
            CAST(round((ln((ct + 0.5) / (tot_t + 32.0))
                        - ln((cr + 0.5) / (tot_r + 32.0))) * 1e6)
                 AS BIGINT) AS micro
          FROM j, tot
        ), wts AS (
          SELECT c.doc_id, SUM(c.c * m.micro) AS micros
          FROM cnt_r c JOIN micro m ON m.bucket = c.bucket GROUP BY 1
        )
        SELECT r.doc_id, COALESCE(micros, 0) / 1e6 AS log_weight,
          (COALESCE(micros, 0)
           + CAST(round(-ln(-ln(
               CAST(concat('0x', substring(
                 md5('dsir-gumbel:' || CAST(r.doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) / 4294967296.0)) * 1e6) AS BIGINT)) / 1e6
          AS sample_key
        FROM raw r LEFT JOIN wts ON wts.doc_id = r.doc_id
        ORDER BY r.doc_id
    """).df()
    assert list(sdf["doc_id"]) == list(odf["doc_id"])
    for col in ("log_weight", "sample_key"):
        for a, b in zip(sdf[col], odf[col]):
            assert a == pytest.approx(b, abs=2e-6)
