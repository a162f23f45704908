"""Round-6 operator tests: tf-idf, sequence packing (distributed
prefix sum), bigram-LM perplexity (CCNet arc), host PageRank, and
anchor-text extraction/aggregation."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from ocr_agent_spark.kernel.links import extract_anchors


# ---------------------------------------------------------------- tf-idf

def test_tfidf_hand_computed(spark):
    from ocr_agent_spark.functions.tfidf import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (0, "apple apple banana"),
            (1, "banana cherry"),
            (2, "cherry cherry cherry durian"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r["doc_id"], r["term"]): (r["tf"], r["score"])
        for r in tfidf_top_terms(docs, k=2).collect()
    }
    idf = lambda df: math.log((3 + 1) / (df + 1)) + 1.0
    # doc 0: apple tf=2 df=1, banana tf=1 df=2
    assert out[(0, "apple")] == (2, round(2 * idf(1), 6))
    assert out[(0, "banana")] == (1, round(1 * idf(2), 6))
    # doc 2 top-2: cherry (tf 3) then durian
    assert out[(2, "cherry")][0] == 3
    assert out[(2, "durian")][0] == 1
    assert len(out) == 6


def test_tfidf_tie_breaks_lexicographic(spark):
    from ocr_agent_spark.functions.tfidf import tfidf_top_terms

    docs = spark.createDataFrame(
        [(0, "zz aa mm"), (1, "zz aa mm")], ["doc_id", "text"]
    )
    rows = tfidf_top_terms(docs, k=2).filter(F.col("doc_id") == 0).collect()
    assert [r["term"] for r in rows] == ["aa", "mm"]  # equal scores


def test_corpus_document_frequency(spark):
    from ocr_agent_spark.functions.tfidf import corpus_document_frequency

    docs = spark.createDataFrame(
        [(0, "a common word"), (1, "common word"), (2, "word")],
        ["doc_id", "text"],
    )
    out = {r["term"]: r["df"] for r in
           corpus_document_frequency(docs, min_df=2).collect()}
    assert out == {"common": 2, "word": 3}


# --------------------------------------------------------------- packing

def test_prefix_sum_matches_serial_scan(spark):
    from ocr_agent_spark.functions.packing import exclusive_prefix_sum

    vals = [(i, (i * 37 + 11) % 90 + 10) for i in range(500)]
    df = spark.createDataFrame(vals, ["doc_id", "n_tokens"])
    # tiny buckets so the two-phase path actually crosses buckets
    out = exclusive_prefix_sum(df, "n_tokens", bucket_width=64).collect()
    got = {r["doc_id"]: r["prefix_sum"] for r in out}
    running = 0
    for i, n in vals:
        assert got[i] == running
        running += n


def test_prefix_sum_sparse_ids(spark):
    from ocr_agent_spark.functions.packing import exclusive_prefix_sum

    df = spark.createDataFrame(
        [(3, 10), (4096, 7), (9000, 5)], ["doc_id", "n_tokens"]
    )
    got = {r["doc_id"]: r["prefix_sum"]
           for r in exclusive_prefix_sum(df, "n_tokens").collect()}
    assert got == {3: 0, 4096: 10, 9000: 17}


def test_assign_packs_budget_bins(spark):
    from ocr_agent_spark.functions.packing import assign_packs, pack_stats

    df = spark.createDataFrame(
        [(0, 60), (1, 60), (2, 60), (3, 60)], ["doc_id", "n_tokens"]
    )
    packed = assign_packs(df, budget=100, bucket_width=2)
    got = {r["doc_id"]: r["pack_id"] for r in packed.collect()}
    # first-token positions 0,60,120,180 → packs 0,0,1,1
    assert got == {0: 0, 1: 0, 2: 1, 3: 1}
    stats = {r["pack_id"]: (r["n_docs"], r["pack_tokens"])
             for r in pack_stats(packed).collect()}
    assert stats == {0: (2, 120), 1: (2, 120)}
    with pytest.raises(ValueError):
        assign_packs(df, budget=0)


# ---------------------------------------------------------- bigram LM

def test_bigram_lm_hand_computed(spark):
    from ocr_agent_spark.functions.lmscore import (
        quality_bucket, score_log_perplexity, train_bigram_lm,
    )

    train = spark.createDataFrame(
        [(0, "the cat sat"), (1, "the cat ran")], ["doc_id", "text"]
    )
    lm = train_bigram_lm(train)
    # histories: the(2), cat(2) → V = 2
    # counts: (the,cat)=2, (cat,sat)=1, (cat,ran)=1
    scored = score_log_perplexity(
        spark.createDataFrame([(7, "the cat sat")], ["doc_id", "text"]), lm
    ).collect()[0]
    p1 = (2 + 1) / (2 + 2)   # the→cat
    p2 = (1 + 1) / (2 + 2)   # cat→sat
    expect = -(math.log(p1) + math.log(p2)) / 2
    assert scored["n_bigrams"] == 2
    assert scored["log_ppl"] == round(expect, 6)

    # unseen history word: c12=0, c1=0 → P = 1/V... = 1/(0+2)
    unseen = score_log_perplexity(
        spark.createDataFrame([(8, "dog bites")], ["doc_id", "text"]), lm
    ).collect()[0]
    assert unseen["log_ppl"] == round(-math.log(1 / (0 + 2)), 6)

    buckets = {
        r["doc_id"]: r["bucket"]
        for r in quality_bucket(
            score_log_perplexity(
                spark.createDataFrame(
                    [(7, "the cat sat"), (8, "dog bites")],
                    ["doc_id", "text"],
                ),
                lm,
            ),
            head_max=0.6,
            middle_max=0.69,
        ).collect()
    }
    assert buckets == {7: "head", 8: "tail"}


def test_bigram_lm_short_docs_excluded(spark):
    from ocr_agent_spark.functions.lmscore import (
        score_log_perplexity, train_bigram_lm,
    )

    train = spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])
    lm = train_bigram_lm(train)
    out = score_log_perplexity(
        spark.createDataFrame(
            [(1, "single"), (2, ""), (3, "a b")], ["doc_id", "text"]
        ),
        lm,
    ).collect()
    assert [r["doc_id"] for r in out] == [3]


# ---------------------------------------------------------- pagerank

def _pagerank_reference(edges, iterations=5, damping=0.85):
    """Serial float replay of the documented semantics."""
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    deg = {}
    simple = sorted(set(edges))
    for s, _ in simple:
        deg[s] = deg.get(s, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        dangling = sum(r for v, r in rank.items() if v not in deg)
        contrib = {v: 0.0 for v in nodes}
        for s, t in simple:
            contrib[t] += rank[s] / deg[s]
        rank = {
            v: (1 - damping) / n
            + damping * (contrib[v] + dangling / n)
            for v in nodes
        }
    return {v: round(r, 6) for v, r in rank.items()}


def test_pagerank_matches_serial_reference(spark):
    from ocr_agent_spark.functions.pagerank import host_pagerank

    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("a", "b"),  # duplicate edge collapses
        # "e" is dangling: appears only as a target
        ("b", "e"),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in host_pagerank(df, 5).collect()}
    want = _pagerank_reference(edges, 5)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) <= 1e-6, v
    # probability mass is conserved (within rounding)
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_pagerank_oracle_sql_matches_spark(spark):
    import duckdb

    from ocr_agent_spark.functions.pagerank import (
        host_pagerank, pagerank_oracle_sql,
    )

    edges = [(f"h{i % 7}", f"h{(i * 3 + 1) % 7}") for i in range(30)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in host_pagerank(df, 5).collect()}
    values = ", ".join(f"('{s}', '{t}')" for s, t in edges)
    sql = pagerank_oracle_sql(
        f"SELECT * FROM (VALUES {values}) AS t(src, dst)", 5
    )
    want = {r[0]: r[1] for r in duckdb.sql(sql).fetchall()}
    assert got == pytest.approx(want, abs=2e-6)


def test_pagerank_validates_iterations(spark):
    from ocr_agent_spark.functions.pagerank import host_pagerank

    df = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        host_pagerank(df, 0)


# ------------------------------------------------------- anchor text

def test_extract_anchors_kernel():
    html = b"""<html><body>
    <a href="https://t.com/a">Visit  <b>Target</b> Site</a>
    <a href="https://t.com/b"><img src=x.png></a>
    <a href="https://t.com/a">dup ignored</a>
    <a href="#frag">skip</a>
    <a href="https://t.com/c">Caf&eacute;</a>
    <a href="https://t.com/trunc">never closed
    </body></html>"""
    got = extract_anchors(html, "https://example.com/")
    assert ("https://t.com/a", "Visit Target Site") in got
    assert ("https://t.com/b", "") in got  # image link: empty text
    assert ("https://t.com/c", "Café") in got
    assert all(h != "https://t.com/trunc" for h, _ in got)


def test_anchor_edges_and_top_texts(spark):
    from ocr_agent_spark.functions.links import (
        extract_anchor_edges, top_anchor_texts,
    )

    def page(url, links):
        body = "".join(f'<a href="{h}">{t}</a>' for h, t in links)
        return (url, f"<html><body>{body}</body></html>".encode())

    pages = spark.createDataFrame(
        [
            page("https://s1.com/", [("https://t.com/x", "Example Site")]),
            page("https://s2.com/", [("https://t.com/x", "Example Site")]),
            page("https://s3.com/", [("https://t.com/x", "click here")]),
            page("https://s4.com/", [("https://t.com/y", "Other"),
                                     ("https://t.com/x", "")]),
        ],
        ["url", "html"],
    )
    edges = extract_anchor_edges(pages)
    top = {r["dst"]: (r["anchor"], r["n_refs"])
           for r in top_anchor_texts(edges, k=1).collect()}
    assert top["https://t.com/x"] == ("Example Site", 2)
    assert top["https://t.com/y"] == ("Other", 1)


# ---------------------------------------------------- quality classifier

def test_quality_classifier_hand_computed(spark):
    import hashlib
    import math

    from ocr_agent_spark.functions.qualityclf import (
        classify_quality, hash_weights, quality_gate,
    )

    dim = 64
    weights = hash_weights(spark, dim=dim)
    wmap = {r["bucket"]: r["weight_micro"] for r in weights.collect()}
    assert len(wmap) == dim
    # weight formula replay (fixed-point micro-units)
    for b in (0, 7, 63):
        h = int(hashlib.md5(f"qclf-v1:{b}".encode()).hexdigest()[:8], 16)
        assert wmap[b] == h * 1000000 // 0x100000000 - 500000

    docs = spark.createDataFrame(
        [(0, "Alpha beta alpha"), (1, ""), (2, "gamma")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in
           classify_quality(docs, weights, dim=dim).collect()}
    assert 1 not in out  # zero tokens → excluded

    def bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dim

    dot = 2 * wmap[bucket("alpha")] + wmap[bucket("beta")]
    logit = round(dot / (3 * 1000000.0), 6)
    assert out[0]["n_terms"] == 3
    assert out[0]["logit"] == pytest.approx(logit, abs=2e-6)
    assert out[0]["prob"] == pytest.approx(
        round(1 / (1 + math.exp(-logit)), 6), abs=2e-6
    )

    kept = quality_gate(classify_quality(docs, weights, dim=dim), 0.0)
    assert kept.count() == 2  # prob >= 0 keeps everything scored


# ----------------------------------------------------- corpus pipeline

def test_corpus_pipeline_report_and_invariants(spark):
    from ocr_agent_spark.corpus import build_training_corpus
    from ocr_agent_spark.functions.qualityclf import hash_weights

    base = (
        "the data be processed to the end of and that have with more "
        "words to clear the gopher floor for this synthetic document"
    )
    rows = [(i, f"{base} variant {i}") for i in range(30)]
    rows += [(100, rows[0][1]), (101, rows[1][1])]  # exact dups
    rows += [(200, "der und die das ist nicht ein mit sich auf " * 4)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    out, counts = build_training_corpus(
        docs,
        lang="en",
        min_words=10,
        clf_weights=hash_weights(spark, dim=64),
        clf_dim=64,
        clf_threshold=0.0,   # keep all scored docs: gate plumbing only
        n_shards=2,
        pack_budget=64,
        report=True,
    )
    got = out.collect()
    stages = {c.stage: (c.rows_in, c.rows_out) for c in counts}
    # stage accounting: monotone, and the known drops land where expected
    assert stages["lang"][0] == 33
    assert stages["lang"][1] == 32          # the German doc drops
    assert stages["dedup_exact"][0] - stages["dedup_exact"][1] == 2
    for c in counts:
        assert c.rows_out <= c.rows_in
    # survivors: one row each, shard in range, packs start at 0 per shard
    ids = [r["doc_id"] for r in got]
    assert len(ids) == len(set(ids))
    assert 100 not in ids and 101 not in ids and 200 not in ids
    assert {r["shard"] for r in got} <= {0, 1}
    for s in {r["shard"] for r in got}:
        packs = sorted(r["pack_id"] for r in got if r["shard"] == s)
        assert packs[0] == 0
    # packing replay: within a shard, exclusive cumsum // budget
    for s in {r["shard"] for r in got}:
        rows_s = sorted(
            (r for r in got if r["shard"] == s),
            key=lambda r: (r["shuffle_key"], r["doc_id"]),
        )
        run = 0
        for r in rows_s:
            assert r["pack_id"] == run // 64
            run += r["n_tokens"]


# ------------------------------------------------------ image dedup

def test_ahash_deterministic_and_discriminative():
    from ocr_agent_spark.functions.imagededup import ahash64
    from ocr_agent_spark.kernel.imagemeta import build_bmp, build_png

    h1, w, h = ahash64(build_png(32, 24, seed=5))
    assert (w, h) == (32, 24)
    assert h1 == ahash64(build_png(32, 24, seed=5))[0]  # deterministic
    # same pixels, different container → identical perceptual hash
    hb = ahash64(build_bmp(32, 24, seed=5))[0]
    assert hb == h1
    # different content → different hash (for these fixtures)
    h2 = ahash64(build_png(32, 24, seed=131))[0]
    assert h2 != h1
    import pytest as _pytest
    with _pytest.raises(Exception):
        ahash64(b"not an image at all")


def test_image_dedup_collapses_cross_container_copies(spark):
    from ocr_agent_spark.functions.imagededup import (
        image_ahash, image_dedup_keep, image_hamming_pairs,
    )
    from ocr_agent_spark.kernel.imagemeta import build_bmp, build_png

    rows = []
    for i in range(4):  # 4 perceptual groups...
        rows.append((i * 10 + 0, bytearray(build_png(20, 20, seed=i * 40))))
        rows.append((i * 10 + 1, bytearray(build_bmp(20, 20, seed=i * 40))))
        rows.append((i * 10 + 2, bytearray(build_png(20, 20, seed=i * 40))))
    rows.append((99, bytearray(b"corrupt bytes")))
    media = spark.createDataFrame(rows, ["media_id", "data"])
    hashes = image_ahash(media)
    got = {r["media_id"]: r for r in hashes.collect()}
    assert got[99]["status"] == "undecodable" and got[99]["ahash"] is None
    for i in range(4):
        assert got[i * 10]["ahash"] == got[i * 10 + 1]["ahash"]

    pairs = image_hamming_pairs(hashes, max_hamming=0).collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {
        (i * 10, i * 10 + 1) for i in range(4)
    } | {(i * 10, i * 10 + 2) for i in range(4)} | {
        (i * 10 + 1, i * 10 + 2) for i in range(4)
    }

    kept = sorted(r["media_id"]
                  for r in image_dedup_keep(hashes, 0).collect())
    assert kept == [0, 10, 20, 30, 99]  # min id per cluster + undecodable
