"""Training-data pipeline operators over ``documents``: quality
gating, within-document repetition scoring, deterministic sampling,
and sequence packing — the corpus-preparation steps between raw text
and a tokenized training set.

All pure built-in expressions (one narrow pass each except packing's
single window) — at 100 TB each runs as a full-scan map with no
driver-side state; sampling and splits are content-hash-deterministic
so re-runs and retries agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inf2106_map_reduce_spark.functions import text as text_fns
from inf2106_map_reduce_spark.tables import load_table


def quality_filter(
    df: DataFrame,
    min_words: int = 15,
    max_stopword_ratio: float = 0.6,
    max_punct_ratio: float = 0.2,
) -> DataFrame:
    """Gopher-style quality gate: keep documents inside the word-count
    and ratio envelopes; emits the features alongside the verdict so
    downstream audits don't recompute them."""
    feats = text_fns.quality_features(df)
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("stopword_ratio") <= max_stopword_ratio)
        & (F.col("punct_ratio") <= max_punct_ratio)
    )
    return feats.withColumn("keep", keep)


def repetition_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition: fraction of duplicated word
    3-grams (1 - distinct/total) — high values flag boilerplate/spam.
    One narrow pass, no shuffle."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    words = F.split(norm, " ")
    n_sh = F.greatest(F.size(words) - 2, F.lit(0))

    def shingles_of(w: Column) -> Column:
        mk = lambda i: F.concat_ws(  # noqa: E731
            " ", F.element_at(w, i), F.element_at(w, i + 1), F.element_at(w, i + 2)
        )
        return F.when(
            F.size(w) >= 3,
            F.transform(F.sequence(F.lit(1), F.size(w) - 2), mk),
        ).otherwise(F.array().cast("array<string>"))

    all_sh = F.flatten(F.transform(F.array(words), shingles_of))
    n_distinct = F.size(F.array_distinct(all_sh))
    rep = F.when(
        n_sh > 0, F.round(1.0 - n_distinct / n_sh.cast("double"), 6)
    ).otherwise(F.lit(0.0))
    return df.select(
        "doc_id",
        n_sh.alias("n_3grams"),
        n_distinct.alias("n_distinct_3grams"),
        rep.alias("repetition_ratio"),
    )


def content_bucket(col: Column, salt: str = "") -> Column:
    """Deterministic hash bucket in [0, 100): the first 8 md5-hex
    chars of ``salt || value`` as a bigint, mod 100 — THE shared
    bucketing idiom of every content-keyed sampler/slice in this
    module (deterministic/stratified sampling, the benchmark slice,
    the manifest's bench exclusion). One definition so a salt or
    width change cannot silently diverge between a slice and its
    consumers."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )


def deterministic_sample(
    df: DataFrame, id_col: str = "doc_id", percent: int = 10, salt: str = "split:"
) -> DataFrame:
    """Content-hash sampling: keep rows whose md5(salt || id) lands in
    the first ``percent`` of 100 buckets. Unlike ``df.sample`` this is
    stable across runs, partitionings, and retries — the property a
    train/eval split must have. Different ``salt`` → independent
    splits."""
    bucket = content_bucket(F.col(id_col), salt)
    return df.withColumn("_bucket", bucket).filter(F.col("_bucket") < percent).drop(
        "_bucket"
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, int],
    strata_col: str = "lang",
    default_percent: int = 0,
    id_col: str = "doc_id",
    salt: str = "strat:",
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy``'s contract,
    content-hash stable): each stratum keeps ``fractions[stratum]``
    percent of its rows, unlisted strata keep ``default_percent``. The
    language-rebalancing step of a corpus mixture — downsample the
    dominant language, keep the rest — with the same retry/partition
    stability as :func:`deterministic_sample`."""
    bucket = content_bucket(F.col(id_col), salt)
    cut = F.lit(default_percent)
    for stratum, pct in sorted(fractions.items()):
        cut = F.when(F.col(strata_col) == stratum, F.lit(pct)).otherwise(cut)
    return df.filter(bucket < cut)


def pack_sequences(
    df: DataFrame,
    seq_len: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 16,
    global_order: bool = False,
) -> DataFrame:
    """Greedy contiguous sequence packing: within a shard, documents
    ordered by id are assigned to fixed-token-budget bins by cumulative
    token count — bin = floor((cumsum - n_tokens) / seq_len), i.e. the
    bin where the document STARTS. Deterministic and expressible as one
    window cumsum — no per-row Python.

    The DEFAULT is per-shard packing (content-hash shard →
    ``Window.partitionBy(shard)``): every shard packs independently and
    in parallel, so the sort is ``n_shards`` independent partition
    sorts — the shape that scales to 100 TB (set ``n_shards`` ≈
    cluster parallelism there). ``global_order=True`` opts into a
    single corpus-wide order: one range-partitioned global sort whose
    window cumsum funnels through ONE task — only for corpora small
    enough to sort on one executor. Bins are identified by
    (shard_id, bin_id); training shards are consumed independently, so
    per-shard bin locality is what packing actually needs — nothing
    downstream wants one global bin numbering.
    """
    toks = F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != ""))
    if global_order:
        shard = F.lit(0).cast("bigint")
    else:
        shard = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("pack:"), F.col(id_col).cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % n_shards
        )
    out = df.select(
        F.col(id_col), toks.alias("n_tokens"), shard.alias("shard_id")
    )
    w = (
        Window.partitionBy("shard_id")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("n_tokens").over(w)
    return out.select(
        id_col,
        "n_tokens",
        "shard_id",
        F.floor((cum - F.col("n_tokens")) / seq_len).cast("bigint").alias("bin_id"),
    )


def _words(text_col: str = "text", lowered: bool = True) -> Column:
    base = F.lower(F.trim(F.col(text_col))) if lowered else F.trim(F.col(text_col))
    return F.filter(F.split(base, r"\s+"), lambda w: w != "")


#: Percent of the corpus carved off as the self-contained benchmark
#: slice (benchmark=None callers); the manifest's bench exclusion uses
#: the SAME constant so the slice and its consumers cannot drift.
BENCHMARK_PERCENT = 5


def benchmark_contamination(
    df: DataFrame,
    benchmark: DataFrame | None = None,
    n: int = 5,
    benchmark_percent: int = BENCHMARK_PERCENT,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    word ``n``-gram with a held-out benchmark set (the C4/GPT-style
    train-test overlap check a training corpus must run before a model
    sees it). Returns (doc_id, n_shared_shingles) for contaminated
    docs only.

    ``benchmark=None`` carves a deterministic content-hash slice of
    ``df`` itself as the benchmark — self-contained for tests; in
    production pass the real eval-set DataFrame.

    Scale: shingles are exploded per doc (distinct within doc), the
    benchmark shingle set is DISTINCT and broadcast (eval suites are
    tiny next to a training corpus), so the check is one narrow pass +
    one broadcast hash join — no shuffle of the corpus itself.
    """
    # Bind the words array ONCE as a transform lambda variable before
    # shingling (same trick as dedup.word_shingles): referencing the
    # split expression inside the per-index lambda re-splits the text
    # for every shingle position — O(words²) regex work per document.
    def _shingles_of(w: Column) -> Column:
        n_sh = F.size(w) - (n - 1)
        mk = lambda i: F.concat_ws(  # noqa: E731
            " ", *[F.element_at(w, i + k) for k in range(n)]
        )
        return F.when(
            n_sh > 0,
            F.array_distinct(F.transform(F.sequence(F.lit(1), n_sh), mk)),
        ).otherwise(F.array().cast("array<string>"))

    shingles = F.flatten(
        F.transform(F.array(_words(text_col)), _shingles_of)
    )
    if benchmark is None:
        # filter BEFORE shingling: each branch only shingles its own
        # slice (the benchmark branch touches 5% of docs, not 100%)
        bucket = content_bucket(F.col(id_col), "bench:")
        bench_docs = df.filter(bucket < benchmark_percent)
        corpus_docs = df.filter(bucket >= benchmark_percent)
    else:
        bench_docs = benchmark
        corpus_docs = df
    bench_shingles = bench_docs.select(F.explode(shingles).alias("shingle"))
    corpus = corpus_docs.select(
        F.col(id_col), F.explode(shingles).alias("shingle")
    )
    return (
        corpus.join(F.broadcast(bench_shingles.distinct()), "shingle")
        .groupBy(id_col)
        .agg(F.count_distinct("shingle").alias("n_shared_shingles"))
    )


def incremental_ingest_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    existing_mod: int = 10,
    existing_lt: int = 3,
) -> DataFrame:
    """Incremental-ingest dedup: the batch a pipeline runs on every new
    crawl — drop incoming docs whose content already exists in the
    corpus snapshot, and collapse exact dups within the batch itself
    (min doc_id survives). Returns accepted (doc_id, content_key).

    The "existing snapshot" here is the deterministic id-slice
    ``doc_id % existing_mod < existing_lt`` so the op is
    self-contained; production passes the snapshot's key table. Scale:
    content keys are 128-bit hashes — the within-batch collapse is one
    hash shuffle, the against-snapshot check a LEFT ANTI join on the
    key (broadcast when the snapshot key set fits, shuffle otherwise);
    the full text never crosses the wire.
    """
    from inf2106_map_reduce_spark.functions.dedup import _norm_text

    keyed = df.select(
        F.col(id_col), F.md5(_norm_text(text_col)).alias("content_key")
    )
    existing = keyed.filter(
        F.col(id_col) % existing_mod < existing_lt
    ).select("content_key")
    incoming = keyed.filter(F.col(id_col) % existing_mod >= existing_lt)
    batch_unique = incoming.groupBy("content_key").agg(
        F.min(id_col).alias(id_col)
    )
    return batch_unique.join(existing, "content_key", "left_anti").select(
        id_col, "content_key"
    )


def vocab_topk(
    df: DataFrame, k: int = 50, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus vocabulary: top-``k`` words by term frequency with
    document frequency — the truncated-vocab construction step of a
    tokenizer/embedding pipeline. Deterministic total order (count
    desc, word asc). Scale: explode + one grouped agg (map-side
    partial), then a k-row TakeOrdered — the corpus never sorts."""
    words = df.select(
        F.col(id_col), F.explode(_words(text_col)).alias("word")
    )
    counts = words.groupBy("word").agg(
        F.count(F.lit(1)).alias("tf"),
        F.count_distinct(id_col).alias("df"),
    )
    # orderBy+limit plans as TakeOrderedAndProject (per-partition top-k
    # + k-row merge); the ranking window then sorts only k rows. A
    # row_number window over the full vocabulary would funnel millions
    # of words through one task at scale.
    top = counts.orderBy(F.desc("tf"), F.asc("word")).limit(k)
    w = Window.orderBy(F.desc("tf"), F.asc("word"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "word", "tf", "df"
    )


def token_chunks(
    df: DataFrame,
    chunk: int = 16,
    stride: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token windows per document (chunk size / stride) —
    the context-window chunking step before embedding or training on
    documents longer than the model context. Emits (doc_id, chunk_idx,
    n_tokens, first_token, last_token) per chunk; the final chunk may
    be partial. One narrow pass (sequence + slice + posexplode), no
    shuffle; ``F.get`` instead of ``element_at`` keeps out-of-range
    lookups NULL under ANSI mode."""
    words = _words(text_col, lowered=False)
    n = F.size(words)
    n_chunks = F.when(n <= chunk, F.lit(1)).otherwise(
        F.ceil((n - chunk) / stride).cast("int") + 1
    )
    rows = df.select(
        F.col(id_col),
        words.alias("_w"),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx", "_i"),
    )
    cw = F.slice(F.col("_w"), F.col("chunk_idx") * stride + 1, chunk)
    return rows.select(
        id_col,
        "chunk_idx",
        F.size(cw).alias("n_tokens"),
        F.get(cw, 0).alias("first_token"),
        F.get(cw, F.size(cw) - 1).alias("last_token"),
    )


# ---------------------------------------------------------------------------
# Registry queries
# ---------------------------------------------------------------------------

def docs_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    out = quality_filter(d)
    return out.select(
        "doc_id", "n_words", "stopword_ratio", "punct_ratio", "keep"
    )


def docs_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_scores(load_table(spark, sf_dir, "documents"))


def docs_sample_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return deterministic_sample(d, percent=10).select("doc_id", "lang")


STRATA_PERCENTS = {"en": 40, "zh": 80}
STRATA_DEFAULT = 100


def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language rebalancing: downsample English to 40%, Chinese to 80%,
    keep the rest — then report the resulting mixture per language."""
    d = load_table(spark, sf_dir, "documents")
    kept = stratified_sample(
        d, STRATA_PERCENTS, default_percent=STRATA_DEFAULT
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_sequences(load_table(spark, sf_dir, "documents"))


def docs_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    return benchmark_contamination(load_table(spark, sf_dir, "documents"))


def dedup_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return incremental_ingest_dedup(load_table(spark, sf_dir, "documents"))


def vocab_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_topk(load_table(spark, sf_dir, "documents"), k=50)


def docs_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_chunks(load_table(spark, sf_dir, "documents"))


def boilerplate_blocks(
    df: DataFrame,
    n: int = 10,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Boilerplate detection: non-overlapping ``n``-word blocks that
    recur across >= ``min_docs`` distinct documents (headers, footers,
    license banners, navigation chrome — the C4/RefinedWeb-style
    template text a corpus strips before training). Emits
    (block_hash, n_docs, n_occurrences); the strip pass is then an
    anti-join of each doc's blocks against this dictionary.

    Scale: blocks are non-overlapping (corpus expands ~1x, vs ~n x for
    shingles), hashed per block, one groupBy — the same single-shuffle
    profile as exact dedup. The words array is bound once per doc
    (transform-over-single-element-array trick) to avoid O(words^2)
    re-splitting.
    """

    def _blocks_of(w: Column) -> Column:
        mk = lambda i: F.md5(  # noqa: E731
            F.concat_ws(" ", *[F.element_at(w, i + k) for k in range(n)])
        )
        return F.when(
            F.size(w) >= n,
            F.transform(F.sequence(F.lit(1), F.size(w) - (n - 1), F.lit(n)), mk),
        ).otherwise(F.array().cast("array<string>"))

    blocks = df.select(
        F.col(id_col),
        F.explode(
            F.flatten(F.transform(F.array(_words(text_col)), _blocks_of))
        ).alias("block_hash"),
    )
    return (
        blocks.groupBy("block_hash")
        .agg(
            F.count_distinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def difficulty_buckets(
    df: DataFrame,
    n_buckets: int = 10,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Curriculum binning: exact length-decile assignment per source
    shard (short→long ordering proxies difficulty for curriculum /
    sequence-length-bucketed batching), summarized per (shard, bucket).

    Scale: ``ntile`` needs a rank, so the window partitions by the
    SHARD — parallelism = #shards, no global single-task sort (the
    pack_sequences lesson). For exact global deciles at 100 TB use
    ``approx_percentile`` boundaries + range bucketing instead; the
    per-shard form is also what curriculum samplers actually consume.
    """
    n_words = F.size(_words(text_col)).alias("n_words")
    w = Window.partitionBy(shard_col).orderBy("n_words", id_col)
    binned = df.select(shard_col, F.col(id_col), n_words).withColumn(
        "bucket", F.ntile(n_buckets).over(w)
    )
    return binned.groupBy(shard_col, "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_words").alias("min_words"),
        F.max("n_words").alias("max_words"),
    )


def curriculum_order(
    df: DataFrame,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Curriculum training order: rank documents short→long within
    each source (length proxies difficulty — the classic curriculum),
    then interleave sources by rank so the global order cycles through
    every source's easiest remaining doc before moving deeper. The
    emitted ``global_pos`` is the exact rank in that
    (rank_in_source, source, doc_id) total order — the sequence a
    curriculum data loader would consume.

    Scale: the per-source rank is a SHARD-partitioned window
    (parallelism = #sources). The global position is NOT a global
    window (that is a single-task sort — the pack_sequences lesson);
    it is computed ARITHMETICALLY from the tiny per-source size table,
    broadcast as an array: docs ranked below r contribute
    Σ_s min(r−1, n_s), and within rank r each lexicographically
    smaller source with n_s ≥ r contributes one slot. The oracle
    states the same order as a plain global ROW_NUMBER — identical
    semantics, deliberately different (scale-correct) plan.
    """
    n_words = F.size(_words(text_col)).alias("n_words")
    w = Window.partitionBy(shard_col).orderBy("n_words", id_col)
    # checkpoint: the ranked projection feeds TWO consumers (the
    # per-source size aggregate and the output crossJoin) with
    # different shapes, so without it the corpus is tokenized twice —
    # the ngram_jaccard_pairs multi-consumer discipline
    ranked = (
        df.select(shard_col, F.col(id_col), n_words)
        .withColumn("rank_in_source", F.row_number().over(w))
        .localCheckpoint(eager=True)
    )
    sizes = (
        ranked.groupBy(shard_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(shard_col).alias("s"), "_n"))
            ).alias("_sizes")
        )
    )
    r = F.col("rank_in_source").cast("long")
    pos = (
        F.aggregate(
            F.col("_sizes"),
            F.lit(0).cast("long"),
            lambda acc, e: acc
            + F.least(r - 1, e["_n"])
            + F.when(
                (e["_n"] >= r) & (e["s"] < F.col(shard_col)), 1
            ).otherwise(0),
        )
        + 1
    )
    return ranked.crossJoin(F.broadcast(sizes)).select(
        F.col(id_col),
        shard_col,
        "n_words",
        "rank_in_source",
        pos.alias("global_pos"),
    )


def docs_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: interleaved short→long curriculum order over
    the documents corpus."""
    return curriculum_order(load_table(spark, sf_dir, "documents"))


def masked_pattern_profile(
    df: DataFrame,
    col: str = "props",
    pattern: str = "[0-9]+",
    replacement: str = "#",
) -> DataFrame:
    """PII-style pattern masking profile: redact every match of
    ``pattern`` (digit runs here — ids, phone-like tokens) and profile
    the resulting templates. The masking expression is the reusable
    scrub pass; the profile (template, n_rows, n_masked_runs) is the
    audit artifact a redaction pipeline ships alongside the cleaned
    corpus.

    Scale: regexp_replace/extract_all are per-row JVM expressions —
    narrow pass, then one small groupBy on the (low-cardinality)
    template. No UDF, no shuffle of raw payloads.
    """
    masked = F.regexp_replace(F.col(col), pattern, replacement)
    n_runs = F.size(F.expr(f"regexp_extract_all({col}, '{pattern}', 0)"))
    return (
        df.select(
            F.col("event_type"),
            masked.alias("template"),
            n_runs.alias("n_runs"),
        )
        .groupBy("event_type", "template")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_runs").alias("n_masked_runs"),
        )
    )


def docs_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return boilerplate_blocks(load_table(spark, sf_dir, "documents"))


def docs_difficulty_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return difficulty_buckets(load_table(spark, sf_dir, "documents"))


def events_masked_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return masked_pattern_profile(load_table(spark, sf_dir, "events"))


def importance_sample(
    df: DataFrame,
    weight_col: Column | None = None,
    scale: int = 40,
    id_col: str = "doc_id",
    salt: str = "wsamp:",
) -> DataFrame:
    """Weighted (importance) sampling, content-hash deterministic: row
    keep-probability is ``min(1, weight*scale/10000)`` — the corpus
    mixture move of over-sampling long/high-quality documents without a
    second pass. Same retry/partition stability contract as
    :func:`deterministic_sample`: md5 buckets, not ``rand()``.

    Scale: one narrow filter pass; the weight is any per-row
    expression, so quality scores or domain weights plug in unchanged.
    """
    if weight_col is None:
        weight_col = F.size(_words("text"))
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint") % 10000
    return df.filter(bucket < F.least(F.lit(10000), weight_col * scale))


def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: length-weighted sample, summarized per lang."""
    d = load_table(spark, sf_dir, "documents")
    kept = importance_sample(d).select(
        "lang", "doc_id", F.size(_words("text")).alias("n_words")
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("sum_words"),
        F.min("doc_id").alias("min_doc"),
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tf: DataFrame | None = None,
) -> DataFrame:
    """Per-document average unigram log-probability under the corpus's
    own unigram model — the CCNet/Gopher-style "perplexity filter"
    signal: documents full of rare tokens (noise, boilerplate codes,
    wrong-language text) score low; fluent in-distribution text scores
    high. Downstream: threshold or bucket on ``avg_logprob`` exactly
    like the quality gate.

    Plan: one explode + per-(doc,word) and per-word aggregates + a
    word-level join + one per-doc aggregate. The corpus total is an
    aggregated scalar cross-joined in (no driver action). At 100 TB the
    word-count table is Zipf-bounded (vocabulary, not corpus, sized)
    and the join is broadcast-able for real vocabularies.

    Determinism: each term ``tf·ln(c/N)`` is rounded to 9 decimals
    BEFORE the per-doc sum, and the sum is a word-sorted sequential
    fold — the same summation-order-proofing as the dot-product
    oracles, so the result hash-matches DuckDB exactly.
    """
    if tf is None:
        # one corpus explode+agg, materialized; corpus word counts and
        # the total re-aggregate the (doc, word) tf table instead of
        # re-exploding the corpus per branch (tf= short-circuits with
        # the shared registry stage — text.registry_token_counts)
        tf = text_fns.unigram_tf_table(
            df, id_col, text_col
        ).localCheckpoint(eager=True)
    cnt = tf.groupBy("word").agg(F.sum("tf").cast("bigint").alias("c"))
    n_total = tf.agg(F.sum("tf").cast("bigint").alias("nt"))
    terms = (
        tf.join(cnt, "word")
        .crossJoin(F.broadcast(n_total))
        .select(
            id_col,
            "word",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("c") / F.col("nt")), 9
            ).alias("term"),
        )
    )
    return terms.groupBy(id_col).agg(
        F.sum("tf").alias("n_tokens"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("word", "term"))),
                F.lit(0.0),
                lambda acc, s: acc + s["term"],
            )
            / F.sum("tf"),
            6,
        ).alias("avg_logprob"),
    )


def docs_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: corpus-model unigram log-prob score per doc,
    derived from the shared session token-count stage."""
    return unigram_logprob(
        load_table(spark, sf_dir, "documents"),
        tf=text_fns.registry_token_counts(spark, sf_dir),
    )


def source_mixture_weights(
    df: DataFrame, alpha: float = 0.3, source_col: str = "source"
) -> DataFrame:
    """Temperature-based mixture weights per source: ``w_s ∝ n_s^α``
    (α < 1 up-weights small sources) — the multinomial sampling scheme
    multilingual/multi-source training runs use to set how often each
    source is drawn. Emits per source: doc count, char volume, and the
    normalized mixture weight.

    Plan: one grouped aggregate over the corpus, then a |sources|-row
    epilogue (rounded ``pow`` per source, normalizer as a
    source-sorted sequential fold, broadcast back) — corpus cost is
    the single agg regardless of scale.
    """
    per = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("n_chars")
    )
    nums = per.select(
        "*",
        F.round(F.pow(F.col("n_docs").cast("double"), F.lit(alpha)), 9).alias(
            "_w_raw"
        ),
    )
    z = nums.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct(source_col, "_w_raw"))),
            F.lit(0.0),
            lambda acc, s: acc + s["_w_raw"],
        ).alias("_z")
    )
    return nums.crossJoin(F.broadcast(z)).select(
        source_col,
        "n_docs",
        "n_chars",
        F.round(F.col("_w_raw") / F.col("_z"), 6).alias("mix_weight"),
    )


def docs_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: α=0.3 mixture weights over document sources."""
    return source_mixture_weights(load_table(spark, sf_dir, "documents"))


def train_val_test_split(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    val_pct: int = 10,
    test_pct: int = 10,
) -> DataFrame:
    """Deterministic 3-way corpus split: every doc labeled
    train/val/test by a content-hash bucket — the split every training
    pipeline needs, with the same determinism contract as the samplers
    (content-keyed md5, never ``rand()``: retries, re-runs, and
    incremental additions keep every existing doc in its split; no
    val/test leakage when the corpus is re-processed).

    Scale: pure narrow expression pass, no shuffle.
    """
    bucket = F.conv(F.substring(F.md5(F.col(text_col)), 1, 4), 16, 10).cast(
        "int"
    ) % 100
    split = (
        F.when(bucket < F.lit(100 - val_pct - test_pct), F.lit("train"))
        .when(bucket < F.lit(100 - test_pct), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.select(F.col(id_col), split.alias("split"))


def docs_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: 80/10/10 deterministic split of documents."""
    return train_val_test_split(load_table(spark, sf_dir, "documents"))


def key_coverage(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str
) -> DataFrame:
    """Referential-integrity audit between two keyed tables: one row
    of (matched, left-only, right-only) counts — the first check a
    multi-artifact corpus needs (every document should have its
    embedding row and vice versa; silent drift here poisons every
    downstream join). Key projections are DISTINCT-ed before the join
    so the counts stay key-level even when a side holds duplicate keys
    (a full-outer join over raw rows would otherwise fan out m×n per
    duplicated key and the 'coverage' numbers would stop being key
    counts). Two pre-aggregates + the full-outer key join (keys only —
    payloads never move) + a scalar aggregate."""
    lk = left.select(F.col(left_key).alias("_lk")).distinct()
    rk = right.select(F.col(right_key).alias("_rk")).distinct()
    j = lk.join(rk, lk["_lk"] == rk["_rk"], "full_outer")
    return j.agg(
        F.sum(
            (F.col("_lk").isNotNull() & F.col("_rk").isNotNull()).cast("long")
        ).alias("n_matched"),
        F.sum(F.col("_rk").isNull().cast("long")).alias("n_left_only"),
        F.sum(F.col("_lk").isNull().cast("long")).alias("n_right_only"),
    )


def docs_embedding_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: documents ↔ embeddings key-coverage audit
    (doc_id vs vec_id)."""
    return key_coverage(
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
        "doc_id",
        "vec_id",
    )


def chunk_dedup(
    df: DataFrame,
    chunk: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Within-document duplicate-passage removal (the C4/RefinedWeb-
    style cleaning step that strips repeated lines/passages INSIDE a
    document, complementing the cross-document dedup family): split
    each doc into consecutive ``chunk``-word windows, drop repeated
    windows keeping the FIRST occurrence, and emit per-doc audit
    columns plus an md5 fingerprint of the cleaned text (identical hex
    in DuckDB, so the whole pass is hash-checkable).

    Scale: explode is chunk-granular (n_words/chunk rows per doc, ~5×
    lighter than word-granular), the first-occurrence window
    partitions by (doc, chunk_text) — co-partitioned with the
    following per-doc aggregate's first shuffle key component, and
    both shuffles carry only (id, pos, chunk-hash-sized text). No
    driver state, no skew beyond document length itself.
    """
    words = _words(text_col, lowered=False)
    n_chunks = F.ceil(F.size(words) / chunk).cast("int")
    rows = (
        df.select(F.col(id_col), words.alias("_w"), n_chunks.alias("_nc"))
        # empty/whitespace-only docs have 0 chunks and must vanish from
        # the output (as in the oracle's range(0, 0)); without the
        # filter, sequence(0, -1) auto-DESCENDS to [0, -1] and emits
        # two phantom empty chunks per empty doc
        .filter(F.col("_nc") > 0)
        .select(
            id_col,
            "_w",
            F.posexplode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias(
                "pos", "_i"
            ),
        )
    )
    chunk_text = F.array_join(
        F.slice(F.col("_w"), F.col("pos") * chunk + 1, chunk), " "
    )
    ranked = rows.select(
        id_col, "pos", chunk_text.alias("chunk_text")
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(id_col, "chunk_text").orderBy("pos")
        ),
    )
    return ranked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum((F.col("rn") > 1).cast("long")).alias("n_dupes_removed"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rn") == 1, F.struct("pos", "chunk_text")
                            )
                        )
                    ),
                    lambda s: s["chunk_text"],
                ),
                " ",
            )
        ).alias("clean_fp"),
    )


def docs_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: 5-word-window intra-document dedup over
    documents with cleaned-text fingerprints."""
    return chunk_dedup(load_table(spark, sf_dir, "documents"))


def source_cap(
    df: DataFrame,
    n_per_source: int = 5,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Mixture capping: keep at most ``n_per_source`` documents per
    source, preferring longer documents (n_chars DESC, id ASC tiebreak)
    — the data-mixing move that stops one crawl domain from dominating
    a training corpus.

    Scale: rank-filter compiles to Spark's map-side WindowGroupLimit
    (same plan property pinned for latest-per-key compaction): each
    task forwards at most ``n_per_source`` rows per source to the
    shuffle, so the exchange carries O(sources x cap) rows no matter
    how skewed the per-source document counts are — exactly the skew
    this operator exists to bound.
    """
    w = Window.partitionBy(source_col).orderBy(
        F.col("n_chars").desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_per_source)
        .select(source_col, id_col, "n_chars", F.col("rn").alias("rank_in_source"))
    )


def docs_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: cap every source at its 5 longest documents."""
    return source_cap(load_table(spark, sf_dir, "documents"))


# PII patterns chosen for engine-parity: the same regex means the same
# thing to Java regex (Spark) and RE2 (DuckDB oracle) — ASCII classes,
# \b word boundaries, no backreferences or lookaround.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}(?:\.\d{1,3}){3}\b"
PII_DENYLIST: tuple[str, ...] = ("customer", "spark")


def denylist_regex(denylist: tuple[str, ...] = PII_DENYLIST) -> str:
    """``\\b``-anchored alternation of escaped LITERAL terms. Terms are
    ``re.escape``-d so metacharacters can't change the pattern's
    meaning (or diverge between Java regex and RE2 — backslash-escaped
    punctuation is valid in both); the oracle interpolates this same
    string, so both engines always read the identical pattern."""
    import re

    return r"\b(?:" + "|".join(re.escape(t) for t in denylist) + r")\b"


def pii_scrub(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    denylist: tuple[str, ...] = PII_DENYLIST,
) -> DataFrame:
    """PII / sensitive-term scrubbing: count and redact e-mail
    addresses, IPv4 addresses, and a configurable term denylist —
    the compliance pass every shipped training corpus runs before
    tokenization. Emits per-document match counts (measured on the
    ORIGINAL text) plus the md5 fingerprint of the scrubbed text, so
    an audit can verify the redaction actually happened without
    materializing the cleaned corpus twice.

    Scale: pure per-row expressions (regexp_count / regexp_replace are
    JVM-side, codegen'd) — a narrow full-scan map, no shuffle, no
    Python. The synthetic corpus contains no real PII (email/ip counts
    are structurally zero there) but the patterns still execute; the
    denylist term redaction exercises the rewrite path with real hits.
    """
    deny_re = denylist_regex(denylist)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), PII_EMAIL, "<EMAIL>"),
            PII_IPV4,
            "<IP>",
        ),
        deny_re,
        "<TERM>",
    )
    return df.select(
        id_col,
        F.regexp_count(F.col(text_col), F.lit(PII_EMAIL)).alias("n_email"),
        F.regexp_count(F.col(text_col), F.lit(PII_IPV4)).alias("n_ip"),
        F.regexp_count(F.col(text_col), F.lit(deny_re)).alias("n_denied"),
        F.md5(scrubbed).alias("clean_md5"),
    )


def docs_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: e-mail/IPv4/denylist scrub audit over documents."""
    return pii_scrub(load_table(spark, sf_dir, "documents"))


def source_kl_drift(
    df: DataFrame, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-source token-distribution drift vs the whole corpus:
    ``KL(source || corpus)`` over unigram distributions — the
    mixture-audit signal behind "did this crawl snapshot / new source
    shift the training distribution?". A source whose KL is near zero
    speaks the corpus's language; a high-KL source (code dumped into a
    prose corpus, a new language, boilerplate farms) is exactly what a
    data-mixture owner wants flagged before it trains.

    KL against the corpus needs no smoothing: the corpus includes each
    source, so q(word) > 0 wherever p(word) > 0, and the sum ranges
    only over the source's own vocabulary — no source x vocab grid
    expansion, unlike symmetric JS divergence.

    Plan: one explode, three count aggregations (per (source, word),
    per word, per source), a word-level join (vocabulary-sized, Zipf-
    bounded and broadcast-able at real scale), one scalar cross join,
    one per-source fold. At 100 TB every stage is partial-agg friendly
    and the biggest shuffle carries one row per distinct (source,
    word) — vocabulary terms, not corpus tokens.

    Determinism: each term ``p·ln(p/q)`` is rounded to 9 decimals
    before a word-sorted sequential fold (the unigram-logprob recipe),
    so the result hash-matches DuckDB exactly.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    w = df.select(
        F.col(source_col).alias("source"),
        F.explode(F.split(norm, " ")).alias("word"),
    ).filter(F.col("word") != "")
    # one corpus explode+agg, materialized; every other distribution
    # (per-word, per-source, corpus total) re-aggregates the
    # vocabulary-sized tf table — without this, each derived agg would
    # re-scan and re-explode the corpus (no cross-branch CSE)
    sw = (
        w.groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    c = sw.groupBy("word").agg(F.sum("tf").cast("bigint").alias("c"))
    ns = sw.groupBy("source").agg(F.sum("tf").cast("bigint").alias("ns"))
    nt = sw.agg(F.sum("tf").cast("bigint").alias("nt"))
    p = F.col("tf") / F.col("ns")
    q = F.col("c") / F.col("nt")
    terms = (
        sw.join(c, "word")
        .join(ns, "source")
        .crossJoin(F.broadcast(nt))
        .select(
            "source",
            "word",
            "ns",
            F.round(p * F.log(p / q), 9).alias("term"),
        )
    )
    return terms.groupBy("source").agg(
        F.min("ns").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_vocab"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("word", "term"))),
                F.lit(0.0),
                lambda acc, s: acc + s["term"],
            ),
            6,
        ).alias("kl_vs_corpus"),
    )


def docs_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: per-source unigram KL drift vs the corpus."""
    return source_kl_drift(load_table(spark, sf_dir, "documents"))


def _pareto_mask(pdf):
    """Boolean mask (aligned to ``pdf.index``) of non-dominated points
    in a frame with ``g``/``x``/``y`` columns — dominance is evaluated
    within each ``g`` group only (maximize both objectives; strict
    dominance, so exact ties survive together). Fully vectorized:
    per-(g, x) max, a per-group running max of y over strictly-greater
    x (transform, never groupby.apply — apply unstacks equal-length
    group results into a DataFrame), then a merge back."""
    per = (
        pdf.groupby(["g", "x"], sort=False)["y"]
        .max()
        .reset_index()
        .sort_values(["g", "x"], ascending=[True, False])
    )
    # best y among same-group points with strictly greater x
    per["above"] = per.groupby("g")["y"].transform(
        lambda s: s.shift(1).cummax()
    )
    per = per.rename(columns={"y": "y_max_at_x"})
    j = pdf.merge(per, on=["g", "x"], how="left", sort=False)
    j.index = pdf.index
    mask = (j["above"].isna() | (j["y"] > j["above"])) & (
        j["y"] == j["y_max_at_x"]
    )
    return mask


def pareto_frontier(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Skyline / Pareto-frontier selection per group: the documents no
    other same-group document beats on BOTH objectives (maximize
    ``x_col`` and ``y_col``; strict dominance, so ties survive
    together). The multi-objective curation primitive — "longest AND
    lexically richest" without collapsing the two signals into one
    weighted score whose weights nobody can defend.

    Scale (the classic distributed skyline): a dominance check is not
    partitionable directly, but local pruning is sound — a point
    dominated inside any partition is dominated globally. Stage 1
    drops locally-dominated points per Arrow batch (vectorized numpy
    mask, no Python loop); stage 2 runs the exact mask per group on
    the survivors. Frontier size is O(log n) expected for independent
    objectives, so stage 2's per-group input is the pruned sliver,
    not the corpus; the group column (e.g. language) gives the final
    shuffle its natural partitioning. Worst case (all points on the
    frontier) degrades to the group's own size — same bound as any
    exact per-group operator.

    Determinism: the frontier is a well-defined SET — partitioning
    affects pruning order, never membership.
    """
    pts = df.select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("id"),
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
    )
    schema = "g string, id bigint, x bigint, y bigint"

    def _prune(it):
        for pdf in it:
            if len(pdf):
                yield pdf[_pareto_mask(pdf)]

    pruned = pts.mapInPandas(_prune, schema)
    return (
        pruned.groupBy("g")
        .applyInPandas(lambda _k, pdf: pdf[_pareto_mask(pdf)], schema)
        .select(
            F.col("g").alias(group_col),
            F.col("id").alias(id_col),
            F.col("x").alias(x_col),
            F.col("y").alias(y_col),
        )
    )


def docs_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: per-language skyline over (n_chars, distinct
    word count) — documents no same-language doc beats on both length
    and lexical richness."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    feats = d.select(
        "lang",
        "doc_id",
        "n_chars",
        F.size(F.array_distinct(F.split(norm, " "))).alias("n_distinct_words"),
    )
    return pareto_frontier(
        feats, "n_chars", "n_distinct_words", "lang", "doc_id"
    )


def unigram_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tf: DataFrame | None = None,
) -> DataFrame:
    """Per-document unigram entropy (nats) + type count — the lexical
    diversity companion to :func:`unigram_logprob`: low entropy marks
    repetitive/boilerplate text (a handful of tokens dominate), high
    entropy marks diverse vocabulary. Complements the repetition
    scores with an information-theoretic form.

    Plan: one explode + per-(doc, word) count + one per-doc fold — no
    corpus-level join at all (the distribution is the document's own),
    so the whole thing is two shuffles on doc-sized keys.

    Determinism: each ``-(p ln p)`` term rounded to 9 before a
    word-sorted sequential fold; the final negation is written
    ``0.0 - sum`` so a zero-entropy doc can't produce -0.0 on one
    engine and 0.0 on the other.
    """
    if tf is None:
        # tf feeds both the per-doc total and the term join —
        # materialize so the corpus explode runs once, not per
        # consumer branch (tf= short-circuits with the shared stage)
        tf = text_fns.unigram_tf_table(
            df, id_col, text_col
        ).localCheckpoint(eager=True)
    n = tf.groupBy(id_col).agg(F.sum("tf").alias("n"))
    p = F.col("tf") / F.col("n")
    terms = tf.join(n, id_col).select(
        id_col,
        "word",
        "n",
        F.round(p * F.log(p), 9).alias("term"),
    )
    return terms.groupBy(id_col).agg(
        F.min("n").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(
            F.lit(0.0)
            - F.aggregate(
                F.array_sort(F.collect_list(F.struct("word", "term"))),
                F.lit(0.0),
                lambda acc, s: acc + s["term"],
            ),
            6,
        ).alias("entropy"),
    )


def docs_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: per-doc unigram entropy over documents, derived
    from the shared session token-count stage."""
    return unigram_entropy(
        load_table(spark, sf_dir, "documents"),
        tf=text_fns.registry_token_counts(spark, sf_dir),
    )


def adaptive_quality(
    docs: DataFrame,
    percentile: float = 0.1,
    lang_col: str = "lang",
    tf: DataFrame | None = None,
) -> DataFrame:
    """Per-language adaptive quality gate (the CCNet move): instead of
    one corpus-wide perplexity cutoff — which silently deletes whole
    low-resource languages whose scores sit below the majority
    language's distribution — each document is judged against ITS OWN
    language's unigram-logprob distribution, keeping everything above
    the language's p10.

    Scale: the logprob table is doc-sized and materialized once (it
    feeds both the percentile aggregation and the verdict join); the
    per-language exact percentile materializes each language's scores
    in one aggregation buffer — swap to approx_percentile past ~10⁹
    docs per language. The verdict join is |langs|-sized → broadcast.
    """
    lp = unigram_logprob(docs, tf=tf).join(
        docs.select("doc_id", F.col(lang_col).alias("lang")), "doc_id"
    ).localCheckpoint(eager=True)
    stats = lp.groupBy("lang").agg(
        F.round(
            F.expr(f"percentile(avg_logprob, {percentile})"), 6
        ).alias("lang_p10")
    )
    return lp.join(F.broadcast(stats), "lang").select(
        "doc_id",
        "lang",
        "avg_logprob",
        "lang_p10",
        (F.col("avg_logprob") >= F.col("lang_p10")).alias("keep"),
    )


def docs_adaptive_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: per-language p10 logprob gate over documents,
    derived from the shared session token-count stage."""
    return adaptive_quality(
        load_table(spark, sf_dir, "documents"),
        tf=text_fns.registry_token_counts(spark, sf_dir),
    )


#: DSIR target slice: percent of docs (content-hash selected) treated
#: as the target domain; in production this is the real target corpus.
DSIR_TARGET_PERCENT = 10
DSIR_SALT = "dsir:"


def dsir_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_percent: int = DSIR_TARGET_PERCENT,
    tf: DataFrame | None = None,
) -> DataFrame:
    """DSIR-style importance score (Xie et al., "Data Selection for
    Language Models via Importance Resampling"): per-document average
    log-likelihood ratio between a TARGET-domain unigram model
    (add-one smoothed over the corpus vocabulary) and the corpus
    model. High scores mark documents that look like the target
    domain — the resampling weight that upsamples domain-relevant
    text without a trained classifier. The default target is a
    deterministic content-hash slice of the corpus itself
    (self-contained for tests, same device as benchmark_contamination);
    production passes a real target corpus.

    Scale: ONE corpus explode into a materialized tf table; both
    models (target counts via a narrow hash filter on doc_id — no
    join — and corpus counts) re-aggregate it, vocabulary-sized;
    scalars (vocab size, totals) broadcast. Smoothing is add-one over
    the corpus vocabulary so the target model is defined on every
    corpus word.

    Determinism: per-term rounding to 9 + word-sorted fold + final
    round 6 (the unigram-family recipe).
    """
    if tf is None:
        # tf= short-circuits with the shared registry stage
        tf = text_fns.unigram_tf_table(
            df, id_col, text_col
        ).localCheckpoint(eager=True)

    def bucket(col: Column) -> Column:
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(DSIR_SALT), col.cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % 100
        )

    c = tf.groupBy("word").agg(F.sum("tf").cast("bigint").alias("c"))
    nv = c.agg(
        F.count(F.lit(1)).alias("v"), F.sum("c").cast("bigint").alias("n")
    )
    tt = (
        tf.filter(bucket(F.col(id_col)) < target_percent)
        .groupBy("word")
        .agg(F.sum("tf").cast("bigint").alias("tc"))
    )
    tn = tt.agg(F.coalesce(F.sum("tc"), F.lit(0)).cast("bigint").alias("tn"))
    terms = (
        tf.join(c, "word")
        .join(tt, "word", "left")
        .crossJoin(F.broadcast(nv))
        .crossJoin(F.broadcast(tn))
        .select(
            id_col,
            "word",
            "tf",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.coalesce(F.col("tc"), F.lit(0)) + 1)
                        / (F.col("tn") + F.col("v"))
                    )
                    - F.log(F.col("c") / F.col("n"))
                ),
                9,
            ).alias("term"),
        )
    )
    g = terms.groupBy(id_col).agg(
        F.sum("tf").cast("bigint").alias("n_tokens"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("word", "term"))),
                F.lit(0.0),
                lambda acc, s: acc + s["term"],
            )
            / F.sum("tf"),
            6,
        ).alias("dsir_score"),
    )
    return g.select(
        id_col,
        "n_tokens",
        (bucket(F.col(id_col)) < target_percent).alias("in_target"),
        "dsir_score",
    )


def docs_dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: DSIR importance scores vs the content-hash
    target slice, derived from the shared session token-count stage."""
    return dsir_scores(
        load_table(spark, sf_dir, "documents"),
        tf=text_fns.registry_token_counts(spark, sf_dir),
    )


def bigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document average bigram log-probability under the corpus's
    own add-one-smoothed bigram model — the KenLM-style perplexity
    filter one order up from :func:`unigram_logprob`: word-salad text
    that sneaks past unigram frequencies (every word common, no word
    PAIR common) scores low here. P(w2|w1) = (c(w1,w2) + 1) /
    (c(w1·) + V), V = vocabulary size; docs score the mean ln P over
    their bigram occurrences.

    Plan: one explode per corpus (words with position), bigrams via
    one lead() window partitioned by doc (no self-join on position —
    the window reuses the explode's partitioning), then per-(doc,
    bigram) tf / per-bigram counts / per-first-word counts — the
    bigram-count table is the join spine. At 100 TB the bigram
    vocabulary is Zipf-bounded (grows sublinearly with the corpus) and
    the scalar V broadcast is free.

    Determinism: each term ``tf·ln(p)`` rounds to 9 before the
    (w1, w2)-sorted sequential fold; final round to 6 — the same
    summation-order-proofing as the unigram score. Docs with fewer
    than 2 words would have no bigram rows; the testdata floor is 10
    words/doc, and the oracle drops such docs identically (inner
    grouping over the bigram table on both sides).
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    words = df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(F.split(norm, " "), lambda w: w != "")
        ).alias("pos", "w1"),
    )
    wnd = Window.partitionBy(id_col).orderBy("pos")
    bg = words.select(
        id_col, "w1", F.lead("w1").over(wnd).alias("w2")
    ).filter(F.col("w2").isNotNull())
    # (doc, bigram) tf — materialized: bigram counts, first-word
    # counts and V all re-aggregate it instead of replaying the
    # explode + window
    tf = (
        bg.groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    c12 = tf.groupBy("w1", "w2").agg(F.sum("tf").cast("bigint").alias("c12"))
    c1 = tf.groupBy("w1").agg(F.sum("tf").cast("bigint").alias("c1"))
    vocab = tf.select(F.col("w1").alias("w")).union(
        tf.select(F.col("w2").alias("w"))
    )
    v = vocab.distinct().agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    terms = (
        tf.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            id_col,
            "w1",
            "w2",
            "tf",
            F.round(
                F.col("tf")
                * F.log((F.col("c12") + 1) / (F.col("c1") + F.col("v"))),
                9,
            ).alias("term"),
        )
    )
    return terms.groupBy(id_col).agg(
        F.sum("tf").cast("bigint").alias("n_bigrams"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("w1", "w2", "term"))),
                F.lit(0.0),
                lambda acc, s: acc + s["term"],
            )
            / F.sum("tf"),
            6,
        ).alias("avg_logprob"),
    )


def docs_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: corpus-model bigram log-prob score per doc."""
    return bigram_logprob(load_table(spark, sf_dir, "documents"))


def docs_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: the END-TO-END corpus build — the manifest a
    training run consumes, produced by composing four pipeline stages
    in one query: (1) Gopher-style quality gate, (2) near-dup removal
    (only each cluster's canonical doc survives, from the shared
    candidate-graph stages), (3) benchmark decontamination (any shared
    5-gram with the held-out slice disqualifies; the slice itself is
    excluded — it IS the benchmark), (4) deterministic content-hash
    train/val/test split. One row per surviving doc: identity, source
    metadata, token count, split.

    This is the flagship composition proof: every stage is an
    independently oracle-verified operator, and the composed output is
    hash-checked against the composed SQL — a user running the
    reference's "whole pipeline" runs exactly this.

    Scale: the pieces keep their individual shapes (narrow quality
    pass; candidate-bounded dedup from the session stages; broadcast
    decontamination join; hash-bucket split) — composition adds only
    doc_id-keyed semi/anti joins, all on the same key."""
    from inf2106_map_reduce_spark.functions.dedup import (
        _registry_components,
    )

    d = load_table(spark, sf_dir, "documents")
    kept = quality_filter(d).filter("keep").select("doc_id", "n_words")
    losers = (
        _registry_components(spark, sf_dir)
        .filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias("doc_id"))
    )
    contaminated = benchmark_contamination(d).select("doc_id")
    # the split is a PER-ROW expression of the text hash — computed
    # inline on the surviving rows (the oracle does the same), never
    # via a corpus-scale join against a second documents scan
    split_bucket = F.conv(
        F.substring(F.md5(F.col("text")), 1, 4), 16, 10
    ).cast("int") % 100
    split = (
        F.when(split_bucket < 80, F.lit("train"))
        .when(split_bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.filter(content_bucket(F.col("doc_id"), "bench:") >= BENCHMARK_PERCENT)
        .select("doc_id", "lang", "source", split.alias("split"))
        .join(kept, "doc_id")
        .join(losers, "doc_id", "left_anti")
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "lang", "source", "n_words", "split")
    )


# ---------------------------------------------------------------------------
# Per-group deterministic reservoir sample (bounded top-k over a hash)
# ---------------------------------------------------------------------------

#: Reservoir size per group. Small so the emitted sample (and the
#: shuffle that carries it) is O(groups x k) regardless of corpus size.
RESERVOIR_K = 4


def group_reservoir(
    df: DataFrame,
    group_col: str = "lang",
    k: int = RESERVOIR_K,
    id_col: str = "doc_id",
    salt: str = "rsv:",
) -> DataFrame:
    """Deterministic per-group reservoir sample: exactly
    ``min(k, |group|)`` rows per group, each group member equally
    likely under the hash's uniformity — the bounded-per-group form
    the sampling family lacked (stratified/weighted thin by RATE, so a
    whale group still emits millions of rows; this caps the output).

    Method: rank rows within each group by ``md5(salt || id)`` and
    keep rank <= k — the bottom-k-priority formulation of reservoir
    sampling (Efraimidis–Spirakis with uniform keys, public method).
    A content hash instead of ``rand()`` keeps the draw stable across
    retries, partitionings, and engines; changing the salt redraws.

    Scale: the rank+filter compiles to Spark's map-side
    WindowGroupLimit (pinned in tests/test_round11_operators.py) —
    each task
    forwards at most k rows per group to the shuffle, so the exchange
    carries O(groups x k) rows even when one group holds half the
    corpus. No global sort anywhere.
    """
    draw = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(draw.asc(), F.col(id_col).asc())
    return (
        df.withColumn("draw", draw)
        .withColumn("rank_in_group", F.row_number().over(w))
        .filter(F.col("rank_in_group") <= k)
    )


def docs_group_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: deterministic 4-doc reservoir per language."""
    return group_reservoir(load_table(spark, sf_dir, "documents")).select(
        "lang", "rank_in_group", "doc_id", "n_chars"
    )


#: Weighted reservoir size per group (small: output O(groups x k)).
WEIGHTED_RESERVOIR_K = 3

#: Integer weight-class cap for the weighted reservoir: weights are
#: 1..8 (one per started 64-char block, capped) so the per-row draw
#: list stays a bounded constant and the selection distribution is
#: exactly replayable from integers. 64 spreads the synthetic corpus
#: (n_chars ~48-560, median ~306) across the full 1..8 class range —
#: a 500-char block had mapped ~93% of docs to weight 1, making the
#: "weighted" draw indistinguishable from uniform on the gate data.
WEIGHT_CLASS_CAP = 7
WEIGHT_CLASS_CHARS = 64.0


def group_weighted_reservoir(
    df: DataFrame,
    group_col: str = "lang",
    k: int = WEIGHTED_RESERVOIR_K,
    id_col: str = "doc_id",
    salt: str = "wrsv:",
) -> DataFrame:
    """Weighted per-group reservoir sample — bounded like
    :func:`group_reservoir` but with selection probability
    proportional to an integer weight class (longer documents drawn
    more often), via the MIN-OF-W-KEYS construction: each row gets
    ``w`` independent hash keys and its priority is their minimum, so
    ``P(row wins rank 1) = w_i / sum(w)`` exactly (every one of the
    sum(w) i.i.d. keys is equally likely to be the global minimum),
    and ranking by priority is sampling WITHOUT replacement
    proportional to weights — the integer-weight specialization of
    Efraimidis–Spirakis bottom-k, done entirely in md5/string-min
    arithmetic so both engines replay it bit-for-bit (no ``ln``/
    ``pow`` whose last-ulp libm differences could reorder near-ties).

    Plan: the draw list is built per row with sequence/transform and
    collapsed by ``array_min`` — pure whole-stage codegen, NO explode,
    no extra shuffle — then the same rank<=k filter compiles to
    map-side WindowGroupLimit (exchange bounded at O(groups x k)).

    Weight class: ``1 + min(cap, floor(n_chars / 64))`` — a bounded
    small integer so the per-row work is O(cap) and the distribution
    is auditable from the emitted ``weight`` column."""
    w_int = F.lit(1) + F.least(
        F.lit(WEIGHT_CLASS_CAP),
        F.floor(F.col("n_chars") / F.lit(WEIGHT_CLASS_CHARS)).cast("int"),
    )
    pri = F.array_min(
        F.transform(
            F.sequence(F.lit(1), w_int),
            lambda j: F.md5(
                F.concat(
                    F.lit(salt),
                    F.col(id_col).cast("string"),
                    F.lit(":"),
                    j.cast("string"),
                )
            ),
        )
    )
    wnd = Window.partitionBy(group_col).orderBy(
        F.col("_pri").asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("weight", w_int)
        .withColumn("_pri", pri)
        .withColumn("rank_in_group", F.row_number().over(wnd))
        .filter(F.col("rank_in_group") <= k)
    )


def docs_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: length-weighted 3-doc reservoir per language."""
    return group_weighted_reservoir(
        load_table(spark, sf_dir, "documents")
    ).select("lang", "rank_in_group", "doc_id", "weight", "n_chars")
