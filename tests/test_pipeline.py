"""Training-data pipeline behavioral tests: planted-case repetition,
sampling stability/independence, packing budget invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from inf2106_map_reduce_spark.functions import pipeline
from inf2106_map_reduce_spark.tables import load_table


def test_repetition_planted_cases(spark):
    rows = [
        (1, "a b c d e f g h"),                  # all 3-grams distinct -> 0
        (2, "x y z x y z x y z x y z"),           # heavy repetition
        (3, "one two"),                           # too short -> 0 grams
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in pipeline.repetition_scores(df).collect()}
    assert out[1]["repetition_ratio"] == 0.0
    assert out[2]["repetition_ratio"] > 0.5
    assert out[3]["n_3grams"] == 0 and out[3]["repetition_ratio"] == 0.0


def test_deterministic_sample_is_stable_and_salt_independent(spark, sf_oracle):
    d = load_table(spark, sf_oracle, "documents")
    s1 = {r["doc_id"] for r in pipeline.deterministic_sample(d, percent=10).collect()}
    s2 = {r["doc_id"] for r in pipeline.deterministic_sample(d, percent=10).collect()}
    assert s1 == s2  # stable across runs
    n = d.count()
    assert 0.03 * n < len(s1) < 0.2 * n  # roughly 10%
    other = {
        r["doc_id"]
        for r in pipeline.deterministic_sample(d, percent=10, salt="eval:").collect()
    }
    # different salt -> a genuinely different (near-independent) split
    assert other != s1
    overlap = len(s1 & other) / max(len(s1), 1)
    assert overlap < 0.5


def test_sample_percent_is_monotone(spark, sf_oracle):
    d = load_table(spark, sf_oracle, "documents")
    s10 = {r["doc_id"] for r in pipeline.deterministic_sample(d, percent=10).collect()}
    s50 = {r["doc_id"] for r in pipeline.deterministic_sample(d, percent=50).collect()}
    assert s10 <= s50  # larger percent strictly widens the same bucket order


def test_pack_sequences_bins_are_contiguous_and_budgeted(spark, sf_oracle):
    d = load_table(spark, sf_oracle, "documents")
    out = pipeline.pack_sequences(d, seq_len=512).orderBy("doc_id").collect()
    # within each shard: bins nondecreasing in doc order, and every
    # document starts in the bin where its shard-local prefix ends
    by_shard: dict[int, int] = {}
    last_bin: dict[int, int] = {}
    for r in out:
        cum = by_shard.get(r["shard_id"], 0)
        assert r["bin_id"] == cum // 512
        assert r["bin_id"] >= last_bin.get(r["shard_id"], 0)
        by_shard[r["shard_id"]] = cum + r["n_tokens"]
        last_bin[r["shard_id"]] = r["bin_id"]
    assert len(by_shard) > 1  # sharding actually splits the corpus


def test_pack_sequences_global_opt_in_matches_single_shard(spark, sf_oracle):
    d = load_table(spark, sf_oracle, "documents")
    out = pipeline.pack_sequences(d, seq_len=512, global_order=True)
    rows = out.orderBy("doc_id").collect()
    assert {r["shard_id"] for r in rows} == {0}
    cum = 0
    for r in rows:
        assert r["bin_id"] == cum // 512
        cum += r["n_tokens"]


def test_pack_sequences_default_plan_has_no_global_sort(spark, sf_oracle):
    d = load_table(spark, sf_oracle, "documents")
    plan = pipeline.pack_sequences(d)._jdf.queryExecution().executedPlan().toString()
    # per-shard packing hash-partitions on shard_id; a global window
    # would show a single-partition Exchange (SinglePartition)
    assert "SinglePartition" not in plan
    assert "hashpartitioning(shard_id" in plan


def test_quality_filter_keeps_majority_of_clean_corpus(spark, sf_oracle):
    d = load_table(spark, sf_oracle, "documents")
    out = pipeline.quality_filter(d)
    frac = out.filter("keep").count() / out.count()
    assert frac > 0.5  # synthetic corpus is mostly clean prose


def test_stratified_sample_rebalances_and_is_partition_invariant(spark, sf_oracle):
    d = load_table(spark, sf_oracle, "documents")
    fracs = {"en": 40, "zh": 80}
    kept = pipeline.stratified_sample(d, fracs, default_percent=100)
    by_lang = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    base = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert 0.2 * base["en"] < by_lang["en"] < 0.6 * base["en"]
    for lang in ("es", "de", "fr"):  # default 100%: untouched
        assert by_lang[lang] == base[lang]
    # kept set is invariant under repartitioning (retry/shuffle stability)
    ids1 = {r["doc_id"] for r in kept.select("doc_id").collect()}
    ids2 = {
        r["doc_id"]
        for r in pipeline.stratified_sample(
            d.repartition(13), fracs, default_percent=100
        ).select("doc_id").collect()
    }
    assert ids1 == ids2


def test_contamination_flags_only_corpus_docs(spark, sf_oracle):
    d = load_table(spark, sf_oracle, "documents")
    out = pipeline.benchmark_contamination(d)
    flagged = {r["doc_id"] for r in out.collect()}
    bench = {
        r["doc_id"]
        for r in pipeline.deterministic_sample(d, percent=5, salt="bench:").collect()
    }
    assert flagged.isdisjoint(bench)  # benchmark docs are never self-flagged
    for r in out.collect():
        assert r["n_shared_shingles"] >= 1


def test_incremental_ingest_accepts_only_novel_content(spark, sf_oracle):
    d = load_table(spark, sf_oracle, "documents")
    out = pipeline.incremental_ingest_dedup(d).collect()
    keys = [r["content_key"] for r in out]
    assert len(keys) == len(set(keys))  # batch-internal dups collapsed
    from inf2106_map_reduce_spark.functions.dedup import _norm_text
    from pyspark.sql import functions as F

    snapshot = {
        r["k"]
        for r in d.filter(F.col("doc_id") % 10 < 3)
        .select(F.md5(_norm_text("text")).alias("k"))
        .collect()
    }
    assert snapshot.isdisjoint(keys)  # nothing already in the corpus re-enters


def test_vocab_rank_is_contiguous_and_ordered(spark, sf_oracle):
    rows = pipeline.vocab_top50(spark, sf_oracle).orderBy("rank").collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    tfs = [r["tf"] for r in rows]
    assert tfs == sorted(tfs, reverse=True)
    assert all(r["df"] <= r["tf"] for r in rows)


def test_token_chunks_cover_document_with_stride_overlap(spark, sf_oracle):
    d = load_table(spark, sf_oracle, "documents")
    chunks = pipeline.token_chunks(d, chunk=16, stride=12)
    one = (
        chunks.filter("doc_id = 7").orderBy("chunk_idx").collect()
    )
    words = [w for w in d.filter("doc_id = 7").collect()[0]["text"].split() if w]
    assert one[0]["first_token"] == words[0]
    assert one[-1]["last_token"] == words[-1]
    for r in one:
        start = r["chunk_idx"] * 12
        assert r["first_token"] == words[start]
        assert r["n_tokens"] == min(16, len(words) - start)


def test_incremental_ingest_null_text_matches_oracle(spark, sf_oracle, tmp_path):
    """NULL-text injection (VERDICT r03 hazard #2): a NULL text yields a
    NULL content_key; Spark's LEFT ANTI join KEEPS null-key rows while a
    ``NOT IN (subquery)`` oracle would return zero rows the moment the
    snapshot slice contains one NULL. The oracle uses NOT EXISTS, which
    matches anti-join semantics — this pins Spark == oracle on dirty
    data, null-key rows included."""
    import sys

    sys.path.insert(0, "tests")
    from oracle_utils import assert_matches_oracle, duckdb_connection

    from inf2106_map_reduce_spark.queries import REGISTRY
    from inf2106_map_reduce_spark.tables import TABLE_NAMES

    # Dirty sf dir: every table symlinked except documents, which gets
    # NULL text in BOTH the snapshot slice (doc_id%10<3) and the batch.
    dirty = tmp_path / "dirty_sf"
    dirty.mkdir()
    for name in TABLE_NAMES:
        if name != "documents":
            (dirty / f"{name}.parquet").symlink_to(
                f"{sf_oracle}/{name}.parquet"
            )
    d = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    dirtied = d.withColumn(
        "text",
        F.when(F.col("doc_id").isin(1, 2, 13, 17), F.lit(None)).otherwise(
            F.col("text")
        ),
    )
    # single flat file (not a Spark part-dir) so DuckDB's read_parquet
    # sees the same path shape as the real testdata
    dirtied.toPandas().to_parquet(str(dirty / "documents.parquet"), index=False)

    spec = REGISTRY["dedup_incremental_ingest"]
    out = spec.fn(spark, str(dirty))
    # null content_key survives the anti join (doc 13/17 collapse to 13)
    nulls = out.filter(F.col("content_key").isNull()).collect()
    assert [r["doc_id"] for r in nulls] == [13]
    con = duckdb_connection(str(dirty))
    try:
        assert_matches_oracle(out, con, spec.oracle)
    finally:
        con.close()


def test_chunk_dedup_removes_planted_repetition(spark):
    """A doc with a repeated 5-word passage loses the repeat; a doc
    with all-unique windows is untouched (fingerprint = original)."""
    clean = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rep = "one two three four five one two three four five six seven"
    df = spark.createDataFrame(
        [(1, clean), (2, rep)], "doc_id bigint, text string"
    )
    out = {r["doc_id"]: r for r in pipeline.chunk_dedup(df).collect()}
    assert out[1]["n_chunks"] == 2
    assert out[1]["n_dupes_removed"] == 0
    # doc 2: chunks = [one..five, one..five, "six seven"] -> middle dropped
    assert out[2]["n_chunks"] == 3
    assert out[2]["n_dupes_removed"] == 1
    import hashlib

    assert (
        out[2]["clean_fp"]
        == hashlib.md5(b"one two three four five six seven").hexdigest()
    )
    assert out[1]["clean_fp"] == hashlib.md5(clean.encode()).hexdigest()


def test_chunk_dedup_drops_empty_docs(spark):
    """Empty and whitespace-only documents have zero chunks and must be
    absent from the output (Spark's sequence(0,-1) would otherwise
    auto-descend and emit phantom chunks)."""
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "alpha beta")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in pipeline.chunk_dedup(df).collect()}
    assert set(out) == {3}
    assert out[3]["n_chunks"] == 1


def test_unigram_logprob_ranks_fluent_above_rare(spark):
    """A doc made of corpus-common words must outscore a doc of
    hapaxes under the corpus's own unigram model."""
    common = "the cat sat on the mat " * 10
    rare = "zyx qwv jkp bnm vcx lkj"
    filler = [(i, common) for i in range(3, 9)]
    df = spark.createDataFrame(
        [(1, common.strip()), (2, rare)] + filler,
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r["avg_logprob"] for r in pipeline.unigram_logprob(df).collect()}
    assert out[1] > out[2]


def test_mixture_weights_boost_small_sources(spark):
    """alpha<1 gives a small source MORE than its proportional share
    and a large source less; weights sum to 1."""
    rows = [(i, "t", "en", "big", 1) for i in range(90)] + [
        (100 + i, "t", "en", "small", 1) for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    out = {r["source"]: r for r in pipeline.source_mixture_weights(df).collect()}
    assert abs(out["big"]["mix_weight"] + out["small"]["mix_weight"] - 1.0) < 1e-6
    assert out["small"]["mix_weight"] > 0.10  # proportional share would be 0.10
    assert out["big"]["mix_weight"] < 0.90


def test_key_coverage_counts_planted_drift(spark):
    left = spark.createDataFrame([(i,) for i in range(10)], "k bigint")
    right = spark.createDataFrame([(i,) for i in range(5, 13)], "v bigint")
    row = pipeline.key_coverage(left, right, "k", "v").collect()[0]
    assert (row["n_matched"], row["n_left_only"], row["n_right_only"]) == (5, 5, 3)


def test_key_coverage_is_key_level_under_duplicate_keys(spark):
    """Duplicate keys on either side must NOT inflate the counts
    multiplicatively (the raw full-outer join would emit m*n rows per
    duplicated key): the audit is documented as key-level referential
    integrity, so each distinct key counts once."""
    left = spark.createDataFrame(
        [(0,), (0,), (0,), (1,), (2,)], "k bigint"  # key 0 tripled
    )
    right = spark.createDataFrame(
        [(0,), (0,), (2,), (3,)], "v bigint"  # key 0 doubled
    )
    row = pipeline.key_coverage(left, right, "k", "v").collect()[0]
    # distinct keys: left {0,1,2}, right {0,2,3} -> matched {0,2}
    assert (row["n_matched"], row["n_left_only"], row["n_right_only"]) == (2, 1, 1)


def test_chunk_dedup_matches_python_reference_on_random_corpus(spark):
    """Spark output must equal an independent Python reference
    implementation over a seeded random corpus (50 docs, repeated
    chunks planted by a small vocabulary)."""
    import hashlib
    import math
    import random

    rng = random.Random(99)
    vocab = ["a", "b", "c", "d"]
    docs = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 40)))
        for i in range(50)
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in pipeline.chunk_dedup(df).collect()}
    for i, text in docs.items():
        words = text.split()
        chunks = [
            " ".join(words[p * 5 : p * 5 + 5])
            for p in range(math.ceil(len(words) / 5))
        ]
        seen, kept = set(), []
        for c in chunks:
            if c not in seen:
                seen.add(c)
                kept.append(c)
        r = got[i]
        assert r["n_chunks"] == len(chunks)
        assert r["n_dupes_removed"] == len(chunks) - len(kept)
        assert r["clean_fp"] == hashlib.md5(" ".join(kept).encode()).hexdigest()


def test_split_is_deterministic_partition_of_corpus(spark, sf_oracle):
    from inf2106_map_reduce_spark.tables import load_table

    d = load_table(spark, sf_oracle, "documents")
    a = {(r["doc_id"], r["split"]) for r in pipeline.train_val_test_split(d).collect()}
    b = {(r["doc_id"], r["split"]) for r in pipeline.train_val_test_split(d).collect()}
    assert a == b and len(a) == d.count()
    shares = {}
    for _, s in a:
        shares[s] = shares.get(s, 0) + 1
    n = sum(shares.values())
    assert 0.7 < shares["train"] / n < 0.9
    assert 0.04 < shares["val"] / n < 0.17
    assert 0.04 < shares["test"] / n < 0.17


def test_mixture_weights_single_source_is_unity(spark):
    df = spark.createDataFrame(
        [(1, "t", "en", "only", 5), (2, "t", "en", "only", 7)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    rows = pipeline.source_mixture_weights(df).collect()
    assert len(rows) == 1 and rows[0]["mix_weight"] == 1.0
    assert rows[0]["n_chars"] == 12


def test_unigram_logprob_skips_wordless_docs(spark):
    df = spark.createDataFrame(
        [(1, "hello world hello"), (2, "   "), (3, "")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in pipeline.unigram_logprob(df).collect()}
    assert set(out) == {1}
    assert out[1]["n_tokens"] == 3


def test_source_kl_drift_flags_divergent_source(spark):
    """A source speaking the corpus's dominant language has near-zero
    KL; a source of words nobody else uses diverges. Exact values
    cross-checked against a pure-Python computation."""
    import math
    from collections import Counter

    rows = (
        [(i, "the cat sat on the mat", "en", "crawl", 1) for i in range(8)]
        + [(100 + i, "zyx qwv jkp bnm", "xx", "weird", 1) for i in range(2)]
    )
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    out = {r["source"]: r for r in pipeline.source_kl_drift(df).collect()}
    assert out["weird"]["kl_vs_corpus"] > out["crawl"]["kl_vs_corpus"] >= 0.0

    toks = [(s, w) for _i, t, _l, s, _n in rows for w in t.split()]
    corpus = Counter(w for _s, w in toks)
    nt = len(toks)
    for src in ("crawl", "weird"):
        mine = Counter(w for s, w in toks if s == src)
        ns = sum(mine.values())
        kl = 0.0
        for w in sorted(mine):
            p, q = mine[w] / ns, corpus[w] / nt
            kl += round(p * math.log(p / q), 9)
        assert out[src]["n_tokens"] == ns
        assert out[src]["n_vocab"] == len(mine)
        assert out[src]["kl_vs_corpus"] == round(kl, 6)


def test_source_kl_drift_zero_for_identical_distributions(spark):
    """Two sources with identical token distributions both sit at
    exactly KL = 0 (p == q for every word)."""
    rows = [(1, "a b c", "en", "s1", 1), (2, "a b c", "en", "s2", 1)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    out = {r["source"]: r["kl_vs_corpus"] for r in pipeline.source_kl_drift(df).collect()}
    assert out == {"s1": 0.0, "s2": 0.0}


def test_pareto_frontier_planted_dominance(spark):
    """Strict-dominance semantics: ties survive together, same-x lower
    y is dominated, groups are independent."""
    df = spark.createDataFrame(
        [
            ("en", 1, 10, 5),  # dominated by 2 (same x, higher y)
            ("en", 2, 10, 7),
            ("en", 3, 8, 9),
            ("en", 4, 12, 3),
            ("en", 5, 7, 9),  # dominated by 3 (x 8>7, y 9>=9)
            ("en", 6, 12, 3),  # exact tie with 4: both survive
            ("fr", 7, 1, 1),  # dominated by 8 within fr only
            ("fr", 8, 2, 1),
        ],
        "lang string, doc_id bigint, x bigint, y bigint",
    )
    out = sorted(
        (r["lang"], r["doc_id"])
        for r in pipeline.pareto_frontier(df, "x", "y", "lang").collect()
    )
    assert out == [("en", 2), ("en", 3), ("en", 4), ("en", 6), ("fr", 8)]


def test_pareto_frontier_matches_python_reference_random(spark):
    """Random points vs a brute-force O(n^2) dominance reference; the
    frontier must be partitioning-independent (repartition(13) before
    the operator)."""
    import random

    rng = random.Random(64)
    rows = [
        (rng.choice(["a", "b"]), i, rng.randrange(40), rng.randrange(40))
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "g string, id bigint, x bigint, y bigint"
    ).repartition(13)
    got = sorted(
        (r["g"], r["id"])
        for r in pipeline.pareto_frontier(df, "x", "y", "g", "id").collect()
    )
    want = sorted(
        (g, i)
        for g, i, x, y in rows
        if not any(
            og == g and ((ox >= x and oy > y) or (ox > x and oy >= y))
            for og, _oi, ox, oy in rows
        )
    )
    assert got == want


def test_unigram_entropy_planted_values(spark):
    """Exact entropy cross-checked in Python; a one-word doc has
    exactly 0.0 entropy (never -0.0) and a uniform doc has ln(k)."""
    import math

    df = spark.createDataFrame(
        [
            (1, "a a a a"),  # zero entropy
            (2, "a b c d"),  # uniform over 4 types: ln(4)
            (3, "a a b"),  # 2/3, 1/3
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in pipeline.unigram_entropy(df).collect()}
    assert out[1]["entropy"] == 0.0 and str(out[1]["entropy"]) == "0.0"
    assert out[1]["n_tokens"] == 4 and out[1]["n_types"] == 1
    assert abs(out[2]["entropy"] - math.log(4)) < 1e-6
    want3 = -(
        round(2 / 3 * math.log(2 / 3), 9) + round(1 / 3 * math.log(1 / 3), 9)
    )
    assert out[3]["entropy"] == round(want3, 6)


def test_adaptive_quality_judges_within_language(spark):
    """A low-resource language's docs survive even when their absolute
    logprob sits below the majority language's cutoff — the exact
    failure a corpus-wide threshold causes."""
    en = [(i, "the cat sat on the mat", "en") for i in range(18)]
    en_junk = [(100 + i, "zz qq kk vv ww", "en") for i in range(2)]
    # tiny language: mutually rare tokens -> absolute logprobs far
    # below every en doc
    xx = [(200, "foo bar baz qux quux", "xx"), (201, "foo bar baz corge grault", "xx")]
    df = spark.createDataFrame(
        [(i, t, lang, "s", 1) for i, t, lang in en + en_junk + xx],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = {r["doc_id"]: r for r in pipeline.adaptive_quality(df).collect()}
    # both xx docs above (or at) their own language's p10 -> kept
    assert out[200]["keep"] and out[201]["keep"]
    # xx logprobs are below the en p10 cutoff — a global gate would
    # have dropped them
    en_p10 = out[0]["lang_p10"]
    assert out[200]["avg_logprob"] < en_p10
    # within en, the junk docs fall below the en p10 (18 fluent vs 2 junk)
    assert not out[100]["keep"] and not out[101]["keep"]
    assert out[0]["keep"]


def test_dsir_scores_upweight_target_lookalikes(spark):
    """Docs resembling the target slice score higher than docs that
    don't; exact values cross-checked against a Python replay of the
    smoothed log-likelihood ratio."""
    import hashlib
    import math
    from collections import Counter

    target_text = "machine learning models train on data"
    other_text = "cooking recipes need butter and flour"
    rows = [(i, target_text if i % 2 == 0 else other_text) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in pipeline.dsir_scores(df).collect()}

    def bucket(doc_id: int) -> int:
        return (
            int(
                hashlib.md5(f"{pipeline.DSIR_SALT}{doc_id}".encode()).hexdigest()[:8],
                16,
            )
            % 100
        )

    target_ids = [i for i, _t in rows if bucket(i) < pipeline.DSIR_TARGET_PERCENT]
    assert target_ids, "hash slice empty — test corpus too small"
    for i, _ in rows:
        assert out[i]["in_target"] == (bucket(i) < pipeline.DSIR_TARGET_PERCENT)

    toks = {i: t.split() for i, t in rows}
    corpus = Counter(w for ws in toks.values() for w in ws)
    n = sum(corpus.values())
    v = len(corpus)
    tgt = Counter(w for i in target_ids for w in toks[i])
    tn = sum(tgt.values())
    for i in (0, 1):  # one target-like, one other-like
        per = Counter(toks[i])
        s = 0.0
        for wd in sorted(per):
            s += round(
                per[wd]
                * (
                    math.log((tgt.get(wd, 0) + 1) / (tn + v))
                    - math.log(corpus[wd] / n)
                ),
                9,
            )
        assert out[i]["dsir_score"] == round(s / len(toks[i]), 6)
    # which side scores higher depends on the hash slice composition;
    # assert the DIRECTION matches the slice's majority
    n_target_like = sum(1 for i in target_ids if i % 2 == 0)
    if n_target_like * 2 > len(target_ids):
        assert out[0]["dsir_score"] > out[1]["dsir_score"]
    elif n_target_like * 2 < len(target_ids):
        assert out[1]["dsir_score"] > out[0]["dsir_score"]
