"""Retrieval family: BM25 semantics, RRF fusion algebra, and the PII
scrub rewrite — behavioral checks beyond the oracle hash parity that
tests/test_oracle_parity.py already runs for the registry entries."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F

from inf2106_map_reduce_spark.functions import pipeline, retrieval


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_rewards_tf_and_rare_terms(spark):
    # "rare" appears in 1 of 4 docs, "common" in all 4: the rare-term
    # doc must outrank an equal-length common-term doc, and repeating a
    # term must raise (saturate, not linearly grow) the score.
    docs = _docs(
        spark,
        [
            (0, "rare common pad pad"),
            (1, "common common pad pad"),
            (2, "common pad pad pad"),
            (3, "common pad pad pad"),
        ],
    )
    out = {
        r["doc_id"]: r["bm25"]
        for r in retrieval.bm25_scores(docs, ("rare", "common")).collect()
    }
    assert out[0] > out[1] > out[2]
    assert out[2] == out[3]
    # saturation: doubling tf less than doubles the contribution
    assert out[1] < 2 * out[2]


def test_bm25_matches_textbook_formula_on_tiny_corpus(spark):
    docs = _docs(spark, [(0, "a b"), (1, "a a"), (2, "b b")])
    got = {
        r["doc_id"]: r["bm25"]
        for r in retrieval.bm25_scores(docs, ("a",)).collect()
    }
    k1, b = retrieval.BM25_K1, retrieval.BM25_B
    n_docs, avgdl, df = 3, 2.0, 2
    idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1)

    def score(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    # approx: Spark rounds HALF_UP at 9 then 6, Python round() is
    # half-even — identical to 1e-6 everywhere off a tie boundary
    assert sorted(got) == [0, 1]
    assert got[0] == pytest.approx(score(1, 2), abs=1e-6)
    assert got[1] == pytest.approx(score(2, 2), abs=1e-6)


def test_bm25_topk_rank_is_total_order(spark, sf_oracle):
    out = retrieval.docs_bm25_topk(spark, sf_oracle).collect()
    assert len(out) == retrieval.HYBRID_TOPK
    ranked = sorted(out, key=lambda r: r["bm_rank"])
    assert [r["bm_rank"] for r in ranked] == list(range(1, len(out) + 1))
    for a, b2 in zip(ranked, ranked[1:]):
        assert (a["bm25"], -a["doc_id"]) >= (b2["bm25"], -b2["doc_id"])


def test_hybrid_rrf_fuses_both_rank_lists(spark, sf_oracle):
    out = retrieval.docs_hybrid_rrf(spark, sf_oracle).collect()
    k, rk = retrieval.HYBRID_TOPK, retrieval.RRF_K
    in_bm = [r for r in out if r["bm_rank"] is not None]
    in_cos = [r for r in out if r["cos_rank"] is not None]
    assert len(in_bm) == k and len(in_cos) == k
    # every row's score is exactly the sum of its membership terms
    for r in out:
        want = sum(
            round(1.0 / (rk + r[c]), 9)
            for c in ("bm_rank", "cos_rank")
            if r[c] is not None
        )
        assert r["rrf_score"] == round(want, 9)
    # docs on both lists outrank same-rank single-list docs
    both = [r for r in out if r["bm_rank"] and r["cos_rank"]]
    if both:
        assert max(r["rrf_score"] for r in both) > 1.0 / (rk + 1)


def test_pii_scrub_redacts_planted_pii(spark):
    docs = _docs(
        spark,
        [
            (0, "mail me at jane.doe+x@corp.example.org today"),
            (1, "server 10.0.255.3 and 192.168.1.1 rebooted"),
            (2, "the customer ran spark on spark clusters"),
            (3, "nothing sensitive here"),
        ],
    )
    rows = {r["doc_id"]: r for r in pipeline.pii_scrub(docs).collect()}
    assert (rows[0]["n_email"], rows[0]["n_ip"], rows[0]["n_denied"]) == (1, 0, 0)
    assert (rows[1]["n_email"], rows[1]["n_ip"]) == (0, 2)
    assert rows[2]["n_denied"] == 3
    assert (rows[3]["n_email"], rows[3]["n_ip"], rows[3]["n_denied"]) == (0, 0, 0)
    # the fingerprint is of the REDACTED text, not the original
    scrubbed = (
        docs.select(
            "doc_id",
            F.md5(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(
                            F.col("text"), pipeline.PII_EMAIL, "<EMAIL>"
                        ),
                        pipeline.PII_IPV4,
                        "<IP>",
                    ),
                    r"\b(?:customer|spark)\b",
                    "<TERM>",
                )
            ).alias("want"),
        )
        .collect()
    )
    for r in scrubbed:
        assert rows[r["doc_id"]]["clean_md5"] == r["want"]


def test_pii_patterns_agree_with_python_re_on_crafted_text():
    # engine-parity guard: the patterns are written to mean the same
    # thing in Java regex, RE2, and Python re — pin the Python reading
    # so an edit that drifts into dialect-specific syntax fails here.
    text = (
        "a@b.co x 1.2.3.4 999.999.999.999 no@tld a.b@c.d.ee "
        "1.2.3 1.2.3.4.5 spark sparkle customer"
    )
    assert re.findall(pipeline.PII_EMAIL, text) == ["a@b.co", "a.b@c.d.ee"]
    # 1.2.3.4.5 still contains a \b-delimited 4-octet prefix (dot is a
    # non-word char): both engines see 2 ip-shaped hits here
    assert len(re.findall(pipeline.PII_IPV4, text)) == 3
    assert re.findall(r"\b(?:customer|spark)\b", text) == ["spark", "customer"]


def test_bm25_matches_python_reference_on_random_corpus(spark):
    import random as _random

    rng = _random.Random(2106)
    vocab = [f"t{i}" for i in range(20)]
    texts = {
        i: [rng.choice(vocab) for _ in range(rng.randint(1, 40))]
        for i in range(25)
    }
    terms = ("t0", "t3", "t7")
    k1, b = retrieval.BM25_K1, retrieval.BM25_B
    dls = {i: len(ws) for i, ws in texts.items()}
    n_docs = len(dls)
    avgdl = sum(dls.values()) / n_docs
    dfs = {
        t: sum(1 for ws in texts.values() if t in ws) for t in terms
    }

    def ref(i):
        ws = texts[i]
        total, matched = 0.0, 0
        for t in sorted(terms):
            tf = ws.count(t)
            if tf == 0:
                continue
            matched += 1
            idf = math.log((n_docs - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1)
            total += round(
                idf * tf * (k1 + 1)
                / (tf + k1 * (1 - b + b * dls[i] / avgdl)),
                9,
            )
        return matched, total

    df = _docs(spark, [(i, " ".join(ws)) for i, ws in texts.items()])
    got = {
        r["doc_id"]: (r["n_terms_matched"], r["bm25"])
        for r in retrieval.bm25_scores(df, terms).collect()
    }
    expect = {i: ref(i) for i in texts if ref(i)[0] > 0}
    assert set(got) == set(expect)
    for i, (m, s) in expect.items():
        assert got[i][0] == m
        assert got[i][1] == pytest.approx(s, abs=1e-6)


def test_hybrid_rrf_lsh_is_plan_local_substitution(spark, sf_oracle):
    # same fusion contract as the exact variant: k BM25 rows, <= k
    # dense rows, identical score algebra over whatever ranks exist
    out = retrieval.docs_hybrid_rrf_lsh(spark, sf_oracle).collect()
    k, rk = retrieval.HYBRID_TOPK, retrieval.RRF_K
    assert len([r for r in out if r["bm_rank"] is not None]) == k
    n_dense = len([r for r in out if r["cos_rank"] is not None])
    assert 0 < n_dense <= k
    for r in out:
        want = sum(
            round(1.0 / (rk + r[c]), 9)
            for c in ("bm_rank", "cos_rank")
            if r[c] is not None
        )
        assert r["rrf_score"] == round(want, 9)


def test_bm25_rejects_empty_query(spark):
    with pytest.raises(ValueError, match="non-empty"):
        retrieval.bm25_scores(_docs(spark, [(0, "a")]), ())


# ---------------------------------------------------------------------------
# MMR diversity re-rank
# ---------------------------------------------------------------------------


def _embs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_mmr_demotes_near_duplicate_of_selected(spark):
    # q = x-axis; a and a2 are near-identical vectors (sim ~1), b is
    # equally relevant but orthogonal to them off-query (sim(a,b)~0.5).
    # Pure top-3 by relevance is (a, a2, b); after picking a, a2 pays
    # the full mu redundancy penalty while b pays half, so MMR must
    # interleave the diverse doc: (a, b, a2).
    df = _embs(
        spark,
        [
            (0, (1.0, 0.0, 0.0)),       # the query vector
            (1, (0.71, 0.704, 0.0)),    # a  — most relevant
            (2, (0.70, 0.714, 0.0)),    # a2 — near-dup of a
            (3, (0.70, 0.0, 0.714)),    # b  — diverse
        ],
    )
    out = retrieval.mmr_rerank(
        df, query_vec_id=0, n_candidates=3, k=3
    ).orderBy("sel_rank")
    picks = [r.vec_id for r in out.collect()]
    assert picks == [1, 3, 2]


def test_mmr_trajectory_matches_reference_greedy(spark, sf_oracle):
    # Recompute the greedy trajectory in plain Python from the SAME
    # rounded-6 rel/sim inputs and require identical picks AND scores.
    from inf2106_map_reduce_spark.functions import vector as V
    from inf2106_map_reduce_spark.tables import load_table

    emb = load_table(spark, sf_oracle, "embeddings")
    out = retrieval.mmr_rerank(emb).orderBy("sel_rank").collect()

    cand = V.brute_force_topk(
        emb, query_ids=(0,), k=retrieval.MMR_CANDIDATES
    ).collect()
    rel = {r.vec_id: r.cos_sim for r in cand}
    rows = (
        emb.filter(F.col("vec_id").isin(*rel.keys()))
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}

    def cos(u, v):
        d = na = nb = 0.0
        for x, y in zip(u, v):
            d += x * y
            na += x * x
            nb += y * y
        return round(d / (math.sqrt(na) * math.sqrt(nb)), 6)

    lam, mu = retrieval.MMR_LAMBDA, retrieval.MMR_MU
    selected: list[int] = []
    expect = []
    for t in range(1, retrieval.MMR_K + 1):
        best = None
        for i in sorted(set(rel) - set(selected)):
            mx = max((cos(vecs[i], vecs[j]) for j in selected), default=None)
            score = (
                round(lam * rel[i], 6)
                if mx is None
                else round(lam * rel[i] - mu * mx, 6)
            )
            if best is None or score > best[1]:
                best = (i, score)
        selected.append(best[0])
        expect.append((t, best[0], best[1]))
    got = [(r.sel_rank, r.vec_id, r.mmr_score) for r in out]
    assert got == expect


def test_mmr_first_pick_is_top_relevance_and_ranks_are_dense(spark, sf_oracle):
    from inf2106_map_reduce_spark.tables import load_table

    out = (
        retrieval.mmr_rerank(load_table(spark, sf_oracle, "embeddings"))
        .orderBy("sel_rank")
        .collect()
    )
    assert [r.sel_rank for r in out] == list(range(1, retrieval.MMR_K + 1))
    assert len({r.vec_id for r in out}) == retrieval.MMR_K
    # step 1 is the pure-relevance arg-max, and its mmr is lam*rel
    assert out[0].mmr_score == round(
        retrieval.MMR_LAMBDA * out[0].relevance, 6
    )
    assert out[0].relevance == max(r.relevance for r in out)
