"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard — the core LLM-corpus dedup toolkit, all shuffle-bounded (no
O(n²) pass ever touches the full corpus).

Design for 100 TB:
- exact dedup: one hash-shuffle on a 128-bit content key;
- MinHash LSH: explode→min-agg per (doc, salt) then a self-join ON
  band signature — candidate pairs only, never all pairs;
- n-gram Jaccard verification runs only on LSH candidates;
- SimHash: 32 conditional sums per doc, then bucket joins on rotated
  prefixes.

Determinism: all hashing is md5 (identical in Spark & DuckDB); minhash
is the lexicographic MIN of salted md5 hex strings — no engine-specific
integer hashing anywhere, so every step has an exact SQL oracle.
"""

from __future__ import annotations

import os
from functools import reduce

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inf2106_map_reduce_spark.tables import load_table

N_HASHES = 12  # minhash signature length
BAND_ROWS = 3  # rows per LSH band -> 4 bands
SHINGLE_WORDS = 3


def _norm_text(text_col: str) -> Column:
    return F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")


def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by md5 of normalized content: one row per
    distinct content with the canonical (min) id and duplicate count."""
    h = F.md5(_norm_text(text_col))
    return (
        df.select(F.col(id_col), h.alias("content_key"))
        .groupBy("content_key")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def word_shingles(text_col: str = "text", n: int = SHINGLE_WORDS) -> Column:
    """Distinct n-word shingles of the normalized text (array<string>).

    Built from split + transform over index range — pure JVM
    expressions, no UDF. The words array is bound ONCE as a lambda
    variable (``transform`` over a single-element array) so each
    shingle does 3 array lookups instead of re-splitting the text —
    without this the expression is O(words²) regex work per document
    (measured 14s → 0.5s on 5k docs).
    """

    def shingles_of(w: Column) -> Column:
        n_sh = F.size(w) - (n - 1)
        mk = lambda i: F.concat_ws(" ", *[F.element_at(w, i + k) for k in range(n)])  # noqa: E731
        return F.when(
            n_sh > 0,
            F.array_distinct(F.transform(F.sequence(F.lit(1), n_sh), mk)),
        ).otherwise(F.array().cast("array<string>"))

    words = F.split(_norm_text(text_col), " ")
    return F.flatten(F.transform(F.array(words), shingles_of))


def shingle_table(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, shingle) exploded distinct-shingle table."""
    return df.select(
        F.col(id_col), F.explode(word_shingles(text_col)).alias("shingle")
    )


def ngram_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint: bool = True,
) -> DataFrame:
    """First-occurrence n-gram novelty attribution: every distinct
    shingle in the corpus is OWNED by the lowest-id document that
    contains it; a document's novelty is the share of its distinct
    shingles it owns. The corpus-diversity metric behind "which
    documents contribute new content" decisions — near 1.0 the doc is
    fresh material, near 0.0 everything in it already appeared in an
    earlier (lower-id) document, making it a drop candidate that pure
    pairwise dedup (Jaccard thresholds) can miss when the overlap is
    spread across MANY earlier docs.

    Distributed shape: explode to the distinct (doc, shingle) table →
    hash agg ``min(doc_id)`` per shingle (one shuffle keyed on the
    shingle — the same key MinHash signatures shuffle on) → shuffle
    join back on the shingle → per-doc count aggregation (second
    shuffle, keyed on doc_id). No all-pairs stage anywhere; both
    shuffles are linear in the shingle table, so the shape holds at
    100 TB exactly like the MinHash pipeline it shares its first
    stage with. Docs with fewer words than one shingle have no rows
    here (no shingles to attribute) — deterministic on both engines.

    Returns one row per doc: ``(doc_id, n_shingles, n_novel,
    novelty)`` with ``novelty = n_novel / n_shingles`` rounded to 9 —
    all counts over DISTINCT shingles (the shingle table is distinct
    per doc by construction)."""
    # the shingle table feeds both the ownership aggregate and the
    # join-back; checkpoint it once (the minhash-path idiom at
    # :func:`dedup_candidate_pairs`) so the expensive shingling scan
    # never replays. checkpoint=False is for PLAN INSPECTION only
    # (tools/dump_plans needs the unexecuted lineage).
    sh = shingle_table(df, id_col, text_col)
    if checkpoint:
        sh = sh.localCheckpoint(eager=True)
    owners = sh.groupBy("shingle").agg(F.min(id_col).alias("owner"))
    return (
        sh.join(owners, "shingle")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("owner") == F.col(id_col)).cast("bigint")).alias(
                "n_novel"
            ),
        )
        .select(
            id_col,
            "n_shingles",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_shingles"), 9).alias(
                "novelty"
            ),
        )
    )


def docs_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: first-occurrence 3-gram novelty share per
    document — min-doc_id shingle ownership, two linear shuffles."""
    return ngram_novelty(load_table(spark, sf_dir, "documents"))


def docs_ngram_novelty_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PLAN-INSPECTION variant (tools/dump_plans): shingle-stage
    checkpoint disabled so the dumped plan shows the scan lineage;
    never executed."""
    return ngram_novelty(
        load_table(spark, sf_dir, "documents"), checkpoint=False
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = N_HASHES,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash signature per doc: 4 hashes per salted md5 — hash
    ``4j+k`` is the k-th 8-hex-char slice of ``md5(j || ':' ||
    shingle)``, minimized per doc. One explode + one grouped
    aggregation; the md5s are projected ONCE per (doc, shingle) row
    before the agg (n_hashes/4 digests per shingle, not n_hashes —
    measured ~2× on the candidates query), and the shuffle carries one
    row per doc. 32-bit slices of a strong hash are independent
    uniform hashes; collision effect on the min statistic is ~n²/2³²
    — negligible below ~10^8 distinct shingles per corpus."""
    assert n_hashes % 4 == 0, "n_hashes must be a multiple of 4"
    sh = shingles if shingles is not None else shingle_table(df, id_col, text_col)
    n_digests = n_hashes // 4
    projected = sh.select(
        id_col,
        *[
            F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle"))).alias(f"h{j}")
            for j in range(n_digests)
        ],
    )
    mins = [
        F.min(F.substring(F.col(f"h{i // 4}"), 1 + 8 * (i % 4), 8)).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return projected.groupBy(id_col).agg(*mins)


def minhash_band_cols(
    df: DataFrame,
    text_col: str = "text",
    n_hashes: int = N_HASHES,
    band_rows: int = BAND_ROWS,
) -> DataFrame:
    """Per-ROW LSH band signatures as COLUMNS (``band_0..band_{B-1}``)
    — the narrow, STATELESS form of the MinHash pipeline, built for
    Structured Streaming: the batch form (explode shingles → grouped
    min) is a stateful aggregation a stream cannot chain before a
    join, so here each signature component is computed per row with
    array expressions (``array_min(transform(shingles, ...))``) over
    the SAME quartered-md5 construction as
    :func:`minhash_signatures` — identical band values, zero shuffle,
    zero state.

    A doc with fewer words than one shingle has an empty shingle
    array; ``array_min`` over it is NULL, the band md5 of a NULL
    concat is NULL, and NULL never equi-joins — such docs can never
    band-collide, in both engines."""
    assert n_hashes % 4 == 0, "n_hashes must be a multiple of 4"
    sh = word_shingles(text_col)

    # constants are bound via factory closures, NOT lambda default
    # args: F.transform calls a 2-arity lambda as (element, index), so
    # `lambda s, j=j:` silently receives the array INDEX for j
    def _digests(j: int) -> Column:
        prefix = F.lit(f"{j}:")
        return F.transform(sh, lambda s: F.md5(F.concat(prefix, s)))

    def _min_slice(dig: Column, k: int) -> Column:
        start = 1 + 8 * k
        return F.array_min(
            F.transform(dig, lambda d: F.substring(d, start, 8))
        )

    mh: dict[int, Column] = {}
    for j in range(n_hashes // 4):
        # one digest array per j; the 4 slice-mins below share it via
        # codegen subexpression elimination
        dig = _digests(j)
        for k in range(4):
            mh[4 * j + k] = _min_slice(dig, k)
    bands = [
        F.md5(
            F.concat(*[mh[b * band_rows + r] for r in range(band_rows)])
        ).alias(f"band_{b}")
        for b in range(n_hashes // band_rows)
    ]
    return df.select("*", *bands)


def minhash_band_cols_arrow(
    df: DataFrame,
    text_col: str = "text",
    n_hashes: int = N_HASHES,
    band_rows: int = BAND_ROWS,
) -> DataFrame:
    """Arrow-batched form of :func:`minhash_band_cols` — bit-identical
    band values (equality pinned by tests/test_streaming.py), ~6×
    faster measured at sf0.1 (3.1 s → 0.5 s warm over the stream
    slice). The JVM expression form evaluates 12 interpreted
    higher-order array traversals per row (HOFs are
    codegen-incompatible, so each ``array_min(transform(...))`` is a
    separate interpreted pass); here one vectorized batch computes
    every slice-min in a single pass per shingle with C-speed
    ``hashlib.md5``. Shingling reproduces :func:`word_shingles`
    exactly: Java ``\\s`` is the ASCII whitespace class, mirrored with
    ``re.ASCII``; normalization is trim → lower → collapse — the
    synthetic corpus is ASCII, which both forms assume alike.

    This is the streaming hot path's form: per-row, stateless, zero
    shuffle — the per-batch Python cost is linear in shingle count and
    Arrow-amortized, the same trade the ANN bucketizers make."""
    import hashlib
    import re as _re

    from pyspark.sql.types import StringType, StructField, StructType

    assert n_hashes % 4 == 0, "n_hashes must be a multiple of 4"
    n_dig = n_hashes // 4
    n_bands = n_hashes // band_rows
    ws = _re.compile(r"\s+", _re.ASCII)
    n_words = SHINGLE_WORDS

    def bands_of(text: str | None) -> tuple:
        if text is None:
            return (None,) * n_bands
        # strip(" ") — SPACES ONLY — replicates Spark `trim` exactly
        # (_norm_text). Python's bare strip() also removes \t/\n/\r,
        # which the JVM form instead collapses into a leading/trailing
        # separator, yielding an EMPTY first/last word; the two forms
        # must stay bit-identical or the streaming band screen
        # (streaming/ingest.py) diverges from the snapshot band sets.
        words = ws.sub(" ", text.strip(" ").lower()).split(" ")
        if len(words) < n_words:
            return (None,) * n_bands
        shingles = {
            " ".join(words[i : i + n_words])
            for i in range(len(words) - n_words + 1)
        }
        # 'g' sorts above every hex char — the "no shingle yet" top
        mins = ["g"] * n_hashes
        for s in shingles:
            for j in range(n_dig):
                h = hashlib.md5((f"{j}:" + s).encode()).hexdigest()
                for k in range(4):
                    sl = h[8 * k : 8 * k + 8]
                    if sl < mins[4 * j + k]:
                        mins[4 * j + k] = sl
        return tuple(
            hashlib.md5(
                "".join(
                    mins[b * band_rows : (b + 1) * band_rows]
                ).encode()
            ).hexdigest()
            for b in range(n_bands)
        )

    cols = [f"band_{b}" for b in range(n_bands)]
    schema = StructType([StructField(c, StringType()) for c in cols])

    @F.pandas_udf(schema)
    def _band_udf(texts: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [bands_of(t) for t in texts], columns=cols
        )

    return df.select("*", _band_udf(F.col(text_col)).alias("_bb")).select(
        *df.columns, *[F.col(f"_bb.{c}").alias(c) for c in cols]
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = N_HASHES,
    band_rows: int = BAND_ROWS,
    shingles: DataFrame | None = None,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """LSH banding: docs sharing any band signature become a candidate
    pair (id_a < id_b). The join key is (band_idx, band_sig) — the
    self-join only ever meets docs inside a bucket. ``signatures``
    short-circuits the signature build with a precomputed frame whose
    ``mh0..mh{n_hashes-1}`` columns follow the
    :func:`minhash_signatures` construction (a WIDER signature frame
    is fine — hash ``i`` never depends on ``n_hashes``, so the first
    ``n_hashes`` columns of a 64-hash frame ARE the 12-hash
    signature)."""
    sigs = (
        signatures
        if signatures is not None
        else minhash_signatures(df, id_col, text_col, n_hashes, shingles=shingles)
    )
    n_bands = n_hashes // band_rows
    bands = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.md5(
                F.concat(*[F.col(f"mh{b * band_rows + r}") for r in range(band_rows)])
            ).alias("band_sig"),
        )
        for b in range(n_bands)
    ]
    exploded = sigs.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("band")
    ).select(id_col, "band.band_idx", "band.band_sig")
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs (defaults to
    LSH candidates — never all pairs). Returns (id_a, id_b, jaccard)
    with jaccard >= threshold, rounded to 6.

    The shingle table feeds FOUR plan subtrees (minhash signatures,
    both sides of the common-shingle join, the size aggregate), so it
    is computed once and ``localCheckpoint``-ed instead of re-shingling
    the corpus four times — measured 5.6 s → 2.6 s on sf0.1. The
    materialization is linear in corpus size (it is the same rows the
    shuffle carries anyway); lineage is cut, so an executor loss
    re-runs the query rather than replaying upstream — the right trade
    for a batch pipeline step.
    """
    sh = (
        shingles
        if shingles is not None
        else shingle_table(df, id_col, text_col).localCheckpoint(eager=True)
    )
    if pairs is None:
        pairs = lsh_candidate_pairs(df, id_col, text_col, shingles=sh)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("sa")
    b = sh.alias("sb")
    common = (
        pairs.alias("p")
        .join(a, F.col("p.id_a") == F.col(f"sa.{id_col}"))
        .join(
            b,
            (F.col("p.id_b") == F.col(f"sb.{id_col}"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("p.id_a", "p.id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    # threshold on the UNROUNDED ratio (the oracle's WHERE clause);
    # round(·, 6) only for output — filtering on the rounded value
    # would keep a pair with true J in [threshold − 5e-7, threshold)
    # that the ground truth excludes (round-9 ADVICE item)
    jac = F.col("n_common") / (
        F.col("za.sz") + F.col("zb.sz") - F.col("n_common")
    )
    return (
        common.join(sizes.alias("za"), F.col("id_a") == F.col(f"za.{id_col}"))
        .join(sizes.alias("zb"), F.col("id_b") == F.col(f"zb.{id_col}"))
        .filter(jac >= threshold)
        .select(
            "id_a",
            "id_b",
            F.round(jac, 6).alias("jaccard"),
        )
    )


def word_hash_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exploded per-word hash table (id, hi, lo): the md5-hex first 16
    chars as two 32-bit halves — the shared construction of BOTH
    SimHash widths (32-bit uses ``hi``; 64-bit uses both). Each
    consumer computes it inline: a checkpointed session stage was
    measured and REJECTED (materializing the word-count-sized table
    cost more than the parallel explode+md5 recomputes it saved — see
    :func:`dedup_simhash_signatures`)."""
    words = F.explode(
        F.filter(F.split(_norm_text(text_col), " "), lambda w: w != "")
    ).alias("word")
    md5 = F.md5(F.col("word"))
    hi = F.conv(F.substring(md5, 1, 8), 16, 10).cast("bigint")
    lo = F.conv(F.substring(md5, 9, 8), 16, 10).cast("bigint")
    return df.select(F.col(id_col), words).select(
        id_col, hi.alias("hi"), lo.alias("lo")
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """32-bit SimHash over word hashes (md5-hex first 8 chars → int).

    Per doc: bit j of the signature is 1 iff Σ_words (±1 for word-hash
    bit j) > 0. Computed as 32 conditional SUMs in one aggregation —
    no UDF, one shuffle. Near-dup candidates are then docs whose
    signatures match on a rotated prefix (not part of this function).
    """
    exploded = word_hash_table(df, id_col, text_col).select(
        id_col, F.col("hi").alias("wh")
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("wh"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(32)
    ]
    agg = exploded.groupBy(id_col).agg(*bit_sums)
    sig = reduce(
        lambda acc, j: acc
        + F.when(F.col(f"b{j}") > 0, F.lit(2**j).cast("bigint")).otherwise(F.lit(0)),
        range(32),
        F.lit(0).cast("bigint"),
    )
    return agg.select(F.col(id_col), sig.alias("simhash32"))


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """EXACT sub-quadratic Jaccard similarity self-join via prefix
    filtering (AllPairs, Bayardo et al. 2007, WWW — public method):
    order every document's shingles by a global rare-first total order
    (df asc, shingle asc), index only each doc's PREFIX — the first
    ``|x| - ceil(J*|x|) + 1`` tokens — and generate candidates from
    prefix-prefix token collisions. Completeness theorem: any pair
    with Jaccard >= J has overlap >= ceil(J*|x|) (and >= ceil(J*|y|)),
    so the globally-smallest common token must sit inside BOTH
    prefixes — no qualifying pair is missed. r16 sharpens the join
    asymmetrically (the probing-side prefix shrinks to
    ``|x| - ceil(2J/(1+J)*|x|) + 1`` under a (size, id) total order —
    inline comment below), still with zero recall loss. This is the LSH-free
    exactness path: where the MinHash banding accepts a recall < 1 for
    speed, prefix filtering prunes candidates with zero recall loss.

    Scale: document frequencies come from a count window over the
    shingle partition — ONE shuffle of the shingle stage where the
    groupBy+join form it replaced shuffled it twice (hot shingles are
    the same skew either way → AQE skew-join); per-doc ordering is a
    PARTITION-local window (never a global rank — the total order is
    (df, shingle) itself, which needs no materialized global row
    number); the candidate join is an equi-join on prefix tokens,
    whose postings are short by construction (rare-first ordering
    puts each doc's LOWEST-df tokens in its prefix). Candidates are
    pruned by the PPJoin length + positional filters (see inline
    comment) before verification, which computes the common-token
    count with two id equi-joins against the shingle stage and
    derives Jaccard from the sizes the candidates already carry —
    the pruned pair list is small, so AQE broadcasts it and the
    shingle stage is scanned, never shuffled, by the verify. (A
    candidate-doc semi-restriction before the verify was tried r08
    and REVERTED: it re-plans the candidate subtree into a second
    adaptive branch, measured ~3.5 s slower cold at sf0.1, and at
    scale the broadcast-candidate verify already avoids shuffling
    the shingle table.)
    """
    sh = (
        shingles
        if shingles is not None
        else shingle_table(df, id_col, text_col).localCheckpoint(eager=True)
    )
    ranked = sh.select(
        id_col,
        "shingle",
        F.count(F.lit(1)).over(Window.partitionBy("shingle")).alias("df"),
    ).select(
        id_col,
        "shingle",
        F.row_number()
        .over(Window.partitionBy(id_col).orderBy("df", "shingle"))
        .alias("pos"),
        F.count(F.lit(1)).over(Window.partitionBy(id_col)).alias("m"),
    )
    # Asymmetric prefixes (r16; Xiao et al. 2008 §indexing/probing —
    # public method): under a total order on documents by (m, id), a
    # qualifying pair's globally-smallest common token must lie within
    # the SMALLER document's PROBING prefix (|x| − ceil(2t/(1+t)·|x|)
    # + 1 tokens — overlap ≥ t/(1+t)·(|x|+|y|) ≥ 2t/(1+t)·|x| since
    # |y| ≥ |x|) and within the LARGER document's INDEXING prefix (the
    # plain |y| − ceil(t·|y|) + 1). The probing prefix is a subset of
    # the indexing prefix (2t/(1+t) ≥ t), so this only DROPS collision
    # rows relative to the symmetric form — zero recall loss, measured
    # 33% fewer candidate pairs at sf0.1 (308,504 → 206,688), which is
    # this operator's scale-quadratic term. Output pairs are then
    # re-canonicalized to id_a < id_b.
    tt = float(threshold)
    idx_prefix = ranked.filter(
        F.col("pos")
        <= F.col("m") - F.ceil(F.lit(tt) * F.col("m")) + 1
    )
    probe_prefix = ranked.filter(
        F.col("pos")
        <= F.col("m")
        - F.ceil(F.lit(2 * tt / (1 + tt)) * F.col("m") - F.lit(1e-9))
        + 1
    )
    # PPJoin-style candidate pruning (Xiao et al. 2008, WWW — public
    # method), both filters riding the equi-join row for free:
    # - length filter: J >= t forces t·|x| <= |y| (and symmetrically),
    #   so wildly different sizes can't qualify;
    # - positional filter: for a common token at (pos_a, pos_b),
    #   overlap <= min(pos_a−1, pos_b−1) + min(m_a−pos_a, m_b−pos_b)
    #   + 1 (common tokens split around the collision in BOTH orders);
    #   a qualifying pair needs overlap >= ceil(t/(1+t)·(m_a+m_b)).
    # Both bounds hold at EVERY collision of a qualifying pair, so
    # filtering per collision row loses nothing (zero recall loss);
    # the 1e-9 slack only ever loosens a float boundary. Fewer
    # candidates means the verify joins carry proportionally less —
    # and AQE can flip them to broadcast when the surviving pair list
    # is small.
    alpha = F.ceil(
        F.lit(tt / (1.0 + tt)) * (F.col("pa.m") + F.col("pb.m"))
        - F.lit(1e-9)
    )
    ubound = (
        F.least(F.col("pa.pos") - 1, F.col("pb.pos") - 1)
        + F.least(
            F.col("pa.m") - F.col("pa.pos"),
            F.col("pb.m") - F.col("pb.pos"),
        )
        + 1
    )
    # probe side (pa) strictly earlier in the (m, id) total order than
    # the index side (pb); ids are re-canonicalized below
    mid_order = (F.col("pa.m") < F.col("pb.m")) | (
        (F.col("pa.m") == F.col("pb.m"))
        & (F.col(f"pa.{id_col}") < F.col(f"pb.{id_col}"))
    )
    a_first = F.col(f"pa.{id_col}") < F.col(f"pb.{id_col}")
    cand = (
        probe_prefix.alias("pa")
        .join(
            idx_prefix.alias("pb"),
            (F.col("pa.shingle") == F.col("pb.shingle"))
            & mid_order
            & (F.col("pb.m") >= F.lit(tt) * F.col("pa.m") - F.lit(1e-9))
            & (F.col("pa.m") >= F.lit(tt) * F.col("pb.m") - F.lit(1e-9))
            & (ubound >= alpha),
        )
        .select(
            F.least(f"pa.{id_col}", f"pb.{id_col}").alias("id_a"),
            F.greatest(f"pa.{id_col}", f"pb.{id_col}").alias("id_b"),
            F.when(a_first, F.col("pa.m"))
            .otherwise(F.col("pb.m"))
            .alias("m_a"),
            F.when(a_first, F.col("pb.m"))
            .otherwise(F.col("pa.m"))
            .alias("m_b"),
        )
        .distinct()
        # NOT checkpointed: an eager localCheckpoint of the pair list
        # measured ~13% SLOWER at sf0.1 (median 5.11 s vs 4.50 s over
        # 5 warm runs) — the synchronous materialization costs more
        # than the plan reuse saves
    )
    # lean verification: candidates already carry both set sizes, so
    # only the common-token count needs the shingle table (two id
    # equi-joins + one pair groupBy) — the two per-doc size joins
    # ngram_jaccard_pairs would add are redundant here
    a, b = sh.alias("sa"), sh.alias("sb")
    common = (
        cand.alias("p")
        .join(a, F.col("p.id_a") == F.col(f"sa.{id_col}"))
        .join(
            b,
            (F.col("p.id_b") == F.col(f"sb.{id_col}"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("p.id_a", "p.id_b", "p.m_a", "p.m_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    # UNROUNDED threshold filter, rounded output — matches the
    # ground-truth oracle's convention exactly (round-9 ADVICE item;
    # the completeness theorem only guarantees candidates AT/ABOVE
    # threshold, so a rounded filter could also keep a sub-threshold
    # pair the oracle drops whenever it survived candidate generation)
    jac = F.col("n_common") / (
        F.col("m_a") + F.col("m_b") - F.col("n_common")
    )
    return common.filter(jac >= threshold).select(
        "id_a",
        "id_b",
        F.round(jac, 6).alias("jaccard"),
    )


def simhash_signatures_both(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """BOTH SimHash widths from ONE explode + ONE grouped aggregation.

    The 32-bit signature's bit-j source (``shiftright(hi, j)``) is
    exactly the 64-bit signature's bit-(j+32) source, so the two
    widths share their ``hi`` bit sums completely: 64 conditional
    sums (32 per md5 half) — the same aggregate count as
    :func:`simhash64` alone — yield both signatures, and the
    word-count-sized explode+md5+shuffle runs once instead of twice.
    Signatures are bit-identical to :func:`simhash` /
    :func:`simhash64` (equality unit-pinned; the banded-pair oracles
    hash-check them independently)."""
    exploded = word_hash_table(df, id_col, text_col)
    sums = [
        F.sum(
            F.when(
                F.shiftright(F.col(half), j).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"{half}{j}")
        for half in ("hi", "lo")
        for j in range(32)
    ]
    agg = exploded.groupBy(id_col).agg(*sums)
    sig32 = reduce(
        lambda acc, j: acc
        + F.when(
            F.col(f"hi{j}") > 0, F.lit(2**j).cast("bigint")
        ).otherwise(F.lit(0)),
        range(32),
        F.lit(0).cast("bigint"),
    )
    sig64 = reduce(
        lambda acc, j: acc
        + F.when(
            F.col(f"lo{j}" if j < 32 else f"hi{j - 32}") > 0,
            F.lit(2**j if j < 63 else -(2**63)).cast("bigint"),
        ).otherwise(F.lit(0)),
        range(64),
        F.lit(0).cast("bigint"),
    )
    return agg.select(
        F.col(id_col), sig32.alias("simhash32"), sig64.alias("simhash64")
    )


def _lsh_cosine_single_batch(base: DataFrame, threshold: float) -> DataFrame:
    """One-batch form of the LSH-blocked cosine pair search: coalesce
    the (vid, emb) frame to a single partition and run bucketing +
    scoring + candidate screening in one ``mapInPandas`` pass — no
    sizing aggregate, no sub-block explode, no grouped shuffle, no
    dropDuplicates. Bit-identical contract with the distributed path:
    same :func:`vector.lsh_planes` hyperplanes, same round-9 sign
    test, same round-6 scores, same "pair shares a bucket in ANY
    table" candidate set. The matmul is chunked so transient memory
    stays ~chunk·n·8 B even at the gate bound."""
    import numpy as np
    import pandas as pd

    from inf2106_map_reduce_spark.functions import vector

    planes = vector.lsh_planes()
    n_tables, k = len(planes), len(planes[0])
    pmat = np.array(
        [plane for table in planes for plane in table], dtype=np.float64
    )
    weights = (2 ** np.arange(k)).astype(np.int64)

    def score(batches):
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "cos_sim": pd.Series([], dtype="float64"),
            }
        )
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            yield empty
            return
        pdf = pd.concat(pdfs).sort_values("vid")
        v = pdf["vid"].to_numpy()
        n = len(v)
        if n < 2:
            yield empty
            return
        x = np.stack(pdf["emb"].to_numpy()).astype(np.float64)
        # identical bucket construction to vector.table_buckets_udf
        signs = np.round(x @ pmat.T, 9) > 0
        b = signs.reshape(n, n_tables, k).astype(np.int64) @ weights
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        col = np.arange(n)[None, :]
        step = 2048
        for s in range(0, n, step):
            e = min(s + step, n)
            sim = np.round(xn[s:e] @ xn.T, 6)
            cand = np.zeros((e - s, n), dtype=bool)
            for t in range(n_tables):
                cand |= b[s:e, t][:, None] == b[None, :, t]
            # strict upper triangle in GLOBAL indices: v is sorted, so
            # j > i is exactly id_a < id_b, each pair emitted once
            mask = cand & (sim >= threshold) & (col > np.arange(s, e)[:, None])
            ii, jj = np.where(mask)
            if len(ii):
                yield pd.DataFrame(
                    {"id_a": v[ii + s], "id_b": v[jj], "cos_sim": sim[ii, jj]}
                )

    return base.coalesce(1).mapInPandas(
        score, "id_a bigint, id_b bigint, cos_sim double"
    )


#: Corpus-size gate for the single-batch LSH-cosine fast path: below
#: this row count the whole candidate-generation + scoring pipeline
#: runs as ONE Arrow batch in one Python worker (chunked matmul keeps
#: transient memory ≤ ~chunk·cap·8 B ≈ 135 MB); above it the
#: distributed bucketed path runs untouched. Same idiom as
#: CC_LOCAL_SOLVE_EDGES / the k-means local solve.
COSINE_SINGLE_BATCH_CAP = 8192


def embedding_cosine_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    threshold: float = 0.3,
    use_lsh_blocking: bool = True,
    n_blocks: int = 8,
    bucket_row_budget: int = 4096,
    small_n_cap: int = COSINE_SINGLE_BATCH_CAP,
    n_rows: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cos_sim) for
    every pair with cosine >= threshold, id_a < id_b.

    ``n_rows``: caller-known row count. The small-n fast-path gate
    otherwise runs a bounded ``limit(cap+1).count()`` probe EAGERLY at
    DataFrame-construction time (one extra scan of the un-checkpointed
    upstream lineage, even for explain/plan-only uses — r10 ADVICE
    item). Hot paths and plan-inspection tooling that already know the
    cardinality pass it to skip the probe; ``None`` keeps the
    established bounded-count idiom.

    Two physical strategies behind one semantic:

    - DEFAULT ``use_lsh_blocking=True``: candidates restricted to pairs
      sharing a sign-LSH bucket in any of 8 tables — the 100 TB path:
      cost is Σ bucket², never n² (recall vs exact tested in
      tests/test_dedup.py). The buckets are seeded driver-side
      constants, so the candidate set is deterministic and even
      SQL-mirrorable (the registry oracle embeds the same hyperplanes
      as literals);
    - ``use_lsh_blocking=False``: exact block-matmul, the recall
      baseline. Ids hash into ``n_blocks`` blocks; each vector is
      replicated to the block-pairs it participates in (factor √P
      communication — the standard distributed all-pairs layout), and
      each (bi, bj) group scores its pair subset as ONE numpy matmul
      inside ``applyInPandas``. Exact, no driver collect, and ~100×
      faster than pair-at-a-time fold expressions (38 s → <1 s on 2 k
      vectors) — but O(n²) work overall, the honest cost of exactness:
      opt-in for corpora where n² is affordable.
    """
    import numpy as np
    import pandas as pd

    from inf2106_map_reduce_spark.functions import vector

    base = embeddings.select(
        F.col(id_col).alias("vid"), F.col(emb_col).alias("emb")
    )
    if use_lsh_blocking:
        # SIZE-GATED SINGLE-BATCH FAST PATH (round-9 verdict item #2):
        # below the cap the bucketed pipeline is pure overhead — the
        # sizing agg, the join, the sub-block explode, the grouped
        # applyInPandas shuffle and the dropDuplicates shuffle all
        # orchestrate work one Arrow batch finishes in milliseconds
        # (measured ~1.5 s → ~0.4 s at sf0.1, n=2000, equal oracle
        # hash). Semantics are IDENTICAL, not approximated-differently:
        # the same vector.lsh_planes() hyperplanes, the same round-9
        # sign test, the same round-6 scores, and the same candidate
        # set ("shares a bucket in ANY table") — pinned against the
        # distributed path by test_cosine_fast_path_matches_distributed.
        # The bounded-count probe is the CC/k-means idiom; at scale it
        # returns cap+1 and the bucketed path below runs untouched.
        if small_n_cap and (
            n_rows <= small_n_cap
            if n_rows is not None
            else base.limit(small_n_cap + 1).count() <= small_n_cap
        ):
            return _lsh_cosine_single_batch(base, threshold)
        # Score INSIDE each (table, bucket) group: one normalized
        # matmul per group via applyInPandas, emitting only pairs at or
        # above threshold; the cross-table distinct then runs on the
        # small surviving set. Each vector crosses the Python boundary
        # once per table (Σ bucket sizes = 8n rows ≈ 4 MB at sf0.1) —
        # materializing candidate PAIRS first was measured 100× heavier
        # (Σ bucket² ≈ 1M pairs × two 64-float embeddings ≈ 0.5 GB of
        # shuffle/Arrow traffic; 7 s -> ~1 s with this shape).
        #
        # HOT-BUCKET GUARD: at scale a pathological bucket (boilerplate
        # corpus, adversarial skew) would materialize one giant group
        # and an O(bucket²) sim matrix on a single executor. Buckets
        # over ``bucket_row_budget`` rows are therefore split into
        # ceil(bn/budget) hash sub-blocks BEFORE grouping — each row
        # replicates to its sub-block-pair groups (the same √P layout
        # as the exact path below), so no group ever exceeds ~2×budget
        # rows and the matmul stays bounded. The sizing pass is one
        # count agg on the same (tbl, bucket) key; normal buckets
        # (n/2^n_planes rows) take nsub=1 and score exactly as before.
        def _score_subblock(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype="int64"),
                    "id_b": pd.Series([], dtype="int64"),
                    "cos_sim": pd.Series([], dtype="float64"),
                }
            )
            sbi, sbj = key[2], key[3]
            if sbi == sbj:
                if len(pdf) < 2:
                    return empty
                x = np.stack(pdf["emb"].to_numpy()).astype(np.float64)
                x /= np.linalg.norm(x, axis=1, keepdims=True)
                sim = np.round(x @ x.T, 6)
                ii, jj = np.where(np.triu(sim >= threshold, k=1))
                v = pdf["vid"].to_numpy()
                u, w = v[ii], v[jj]
                return pd.DataFrame(
                    {
                        "id_a": np.minimum(u, w),
                        "id_b": np.maximum(u, w),
                        "cos_sim": sim[ii, jj],
                    }
                )
            a_rows = pdf[pdf["sb"] == sbi]
            b_rows = pdf[pdf["sb"] == sbj]
            if a_rows.empty or b_rows.empty:
                return empty
            xa = np.stack(a_rows["emb"].to_numpy()).astype(np.float64)
            xb = np.stack(b_rows["emb"].to_numpy()).astype(np.float64)
            xa /= np.linalg.norm(xa, axis=1, keepdims=True)
            xb /= np.linalg.norm(xb, axis=1, keepdims=True)
            sim = np.round(xa @ xb.T, 6)
            ii, jj = np.where(sim >= threshold)
            u, w = a_rows["vid"].to_numpy()[ii], b_rows["vid"].to_numpy()[jj]
            return pd.DataFrame(
                {
                    "id_a": np.minimum(u, w),
                    "id_b": np.maximum(u, w),
                    "cos_sim": sim[ii, jj],
                }
            )

        bucketed = vector.bucketize(base, emb_col="emb")
        sizes = bucketed.groupBy("tbl", "bucket").agg(
            F.count(F.lit(1)).alias("_bn")
        )
        nsub = F.least(
            F.ceil(F.col("_bn") / F.lit(bucket_row_budget)), F.lit(64)
        ).cast("int")
        sb = F.pmod(F.xxhash64("vid"), nsub).cast("int")
        sub_pairs = F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), nsub - 1),
                lambda q: F.struct(
                    F.least(F.col("sb"), q).alias("sbi"),
                    F.greatest(F.col("sb"), q).alias("sbj"),
                ),
            )
        )
        replicated = (
            bucketed.join(sizes, ["tbl", "bucket"])
            .withColumn("sb", sb)
            .select(
                "tbl", "bucket", "vid", "emb", "sb",
                F.explode(sub_pairs).alias("bp"),
            )
            .select("tbl", "bucket", "vid", "emb", "sb", "bp.sbi", "bp.sbj")
        )
        pairs = replicated.groupBy("tbl", "bucket", "sbi", "sbj").applyInPandas(
            _score_subblock, "id_a bigint, id_b bigint, cos_sim double"
        )
        # a pair collides in several tables with the identical rounded
        # score — distinct on the key pair alone (within one bucket a
        # pair lands in exactly one sub-block-pair group, so the split
        # itself never duplicates)
        return pairs.dropDuplicates(["id_a", "id_b"])

    # exact path: block-pair replication + per-group matmul
    def _score(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = key
        a_rows = pdf[pdf["blk"] == bi]
        b_rows = pdf[pdf["blk"] == bj]
        if a_rows.empty or b_rows.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
        xa = np.stack(a_rows["emb"].to_numpy()).astype(np.float64)
        xb = np.stack(b_rows["emb"].to_numpy()).astype(np.float64)
        xa /= np.linalg.norm(xa, axis=1, keepdims=True)
        xb /= np.linalg.norm(xb, axis=1, keepdims=True)
        sim = xa @ xb.T
        va = a_rows["vid"].to_numpy()
        vb = b_rows["vid"].to_numpy()
        if bi == bj:
            ii, jj = np.where(va[:, None] < vb[None, :])
        else:
            # distinct blocks: every (u, v) combination is a distinct
            # unordered pair; orient by id below
            ii, jj = np.where(np.ones_like(sim, dtype=bool))
        cos = np.round(sim[ii, jj], 6)
        keep = cos >= threshold
        u, v = va[ii[keep]], vb[jj[keep]]
        return pd.DataFrame(
            {
                "id_a": np.minimum(u, v),
                "id_b": np.maximum(u, v),
                "cos_sim": cos[keep],
            }
        )

    blk = F.pmod(F.col("vid"), F.lit(n_blocks)).cast("int")
    block_pairs = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_blocks - 1)),
            lambda q: F.struct(
                F.least(F.col("blk"), q).alias("bi"),
                F.greatest(F.col("blk"), q).alias("bj"),
            ),
        )
    )
    replicated = (
        base.withColumn("blk", blk)
        .select("vid", "emb", "blk", F.explode(block_pairs).alias("bp"))
        .select("vid", "emb", "blk", "bp.bi", "bp.bj")
    )
    return replicated.groupBy("bi", "bj").applyInPandas(
        _score, "id_a bigint, id_b bigint, cos_sim double"
    )


def _star_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """Alternating large-star / small-star connected components
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC '14 — public algorithm): round count grows with log of the
    component size, INDEPENDENT of diameter, vs the min-label loop's
    O(diameter). Per-round cost is higher (two grouped mins + two
    joins vs one join + one agg), so this is the fallback for
    adversarial long-chain graphs, not the default.

    - large-star: every node attaches its strictly-LARGER neighbors to
      the min of its closed neighborhood — long chains fold toward
      minima from every node at once;
    - small-star: on the (larger -> smaller)-oriented result, every
      node attaches its smaller neighbors (and itself) to their min —
      flattening partial stars.

    Both preserve connectivity; the fixed point is a star per
    component centered at the component's min node id. Convergence is
    detected by an (edge-count, sum-of-xxhash64) fingerprint of the
    canonicalized edge set — one tiny aggregate action per round, and
    each round's edge set is ``localCheckpoint``-ed so lineage never
    re-plans prior rounds.
    """
    e = (
        edges.filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # every original endpoint, for the final label join (component
    # roots have no outgoing star edge)
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _fingerprint(df: DataFrame) -> tuple:
        # decimal(38,0) sum: a long sum of xxhash64 values overflows
        # int64 after a handful of rows, which ANSI mode (the default
        # in vanilla Spark 4 sessions) raises on instead of wrapping
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev = None
    for _ in range(max_iter):
        # large-star over the symmetric view: m = min(closed
        # neighborhood); emit (v, m) for neighbors v > u, plus (u, m)
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        m = F.least(F.col("u"), F.col("mn"))
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), m.alias("b"))
            .union(mins.select(F.col("u").alias("a"), m.alias("b")))
            .filter(F.col("a") != F.col("b"))
            .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
            .distinct()
        )
        # small-star on the (larger -> smaller)-oriented edges: for
        # each u over its smaller neighbors N(u), m = min(N(u)) (< u
        # by orientation); emit (v, m) for v in N(u) plus (u, m)
        mins2 = large.groupBy("u").agg(F.min("v").alias("mn"))
        e = (
            large.join(mins2, "u")
            .select(F.col("v").alias("a"), F.col("mn").alias("b"))
            .union(mins2.select(F.col("u").alias("a"), F.col("mn").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        fp = _fingerprint(e)
        if fp == prev:
            break
        prev = fp
    # Grouped min, not a bare projection: at the star fixed point every
    # node carries exactly one edge (to its component root), but if
    # ``max_iter`` exhausts first the residual edge set can still hold
    # several edges per node — a projection would then emit duplicate /
    # conflicting (node, component) rows that fan out downstream joins.
    # min(v) keeps the output one-row-per-node (and still exact at the
    # fixed point, where the min IS the only edge).
    labels = e.groupBy(F.col("u").alias("node")).agg(
        F.min("v").alias("component")
    )
    return nodes.join(labels, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )


#: Edge gate for the connected-components local-solve fast path: edge
#: lists at or under this bound (~16 MB of id pairs) are collected
#: from their (already-materialized) checkpoint and solved with a
#: driver union-find — the same small-input rationale as the k-means
#: LLOYD_LOCAL_SOLVE_ELEMENTS gate. Near-dup graphs are SPARSE (edges
#: only between verified near-duplicates), so even very large corpora
#: often fit; a 100 TB adversarial graph exceeds the gate and takes
#: the distributed label-propagation / star path unchanged.
CC_LOCAL_SOLVE_EDGES = 1_000_000


def _components_local(spark: SparkSession, head: list) -> DataFrame:
    """Driver union-find over the collected edge list: path-compressed,
    union-by-size, second pass relabels every set to its MIN member —
    exactly the distributed algorithms' fixed point, computed exactly
    (no iteration caps, no convergence detection)."""
    import pandas as pd

    parent: dict[int, int] = {}
    size: dict[int, int] = {}

    def find(a: int) -> int:
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:  # path compression
            parent[a], a = root, parent[a]
        return root

    for r in head:
        u, v = r["u"], r["v"]
        for n in (u, v):
            if n not in parent:
                parent[n] = n
                size[n] = 1
        ru, rv = find(u), find(v)
        if ru != rv:
            if size[ru] < size[rv]:
                ru, rv = rv, ru
            parent[rv] = ru
            size[ru] += size[rv]
    comp_min: dict[int, int] = {}
    for n in parent:
        root = find(n)
        if root not in comp_min or n < comp_min[root]:
            comp_min[root] = n
    nodes = sorted(parent)
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "node": nodes,
                "component": [comp_min[find(n)] for n in nodes],
            }
        ),
        schema="node bigint, component bigint",
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    algorithm: str = "minlabel",
    diameter_budget: int = 8,
) -> DataFrame:
    """Connected components over an undirected edge list → (node,
    component), component = MIN node id in the component. This is the
    cluster-resolution step of a dedup pipeline: near-dup PAIRS become
    duplicate GROUPS, from which one canonical doc per group survives.

    Three strategies behind one semantic (``algorithm=``):

    - ``"minlabel"`` (default): each iteration joins current labels
      onto the symmetric edge list and takes ``min(own, neighbor
      labels)`` in ONE grouped aggregate (the union of
      neighbor-contributed and own labels feeds a single
      ``groupBy(node).min``) — one join + one aggregate shuffle per
      round, converging in O(cluster diameter) rounds. Near-dup
      clusters are shallow, so this is the cheapest default. Round 1
      is folded into initialization — ``min(self, neighbors)`` needs
      no label join, just one aggregate over the edge list. Each round
      runs exactly ONE Spark action: the new labels are lazily
      ``localCheckpoint``-ed (truncating lineage so round *i* never
      re-plans rounds ``0..i-1``) and materialized by the convergence
      count itself. MIN is duplicate-insensitive, so the symmetric
      edge list is never ``distinct``-ed — duplicates cost join width
      only, and the dedup callers feed distinct a<b pairs anyway.
    - ``"star"``: alternating large-star/small-star
      (:func:`_star_components`) — diameter-independent round count
      for adversarial chain graphs, higher per-round cost.
    - ``"auto"``: run min-label for ``diameter_budget`` rounds; if not
      converged, contract the graph by the partial labels (every
      budget-ball collapses to one node) and finish the contracted —
      and therefore much smaller — graph with the star algorithm,
      mapping components back through the partial labels. Normal
      shallow graphs never leave the min-label fast path.
    """
    if algorithm not in ("minlabel", "star", "auto"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    if algorithm == "star":
        return _star_components(
            edges.select(F.col(src).alias("u"), F.col(dst).alias("v")),
            max_iter=max_iter,
        )
    # Checkpoint the incoming edges BEFORE symmetrizing: the union
    # references ``edges`` twice, so an un-materialized edge list (e.g.
    # the whole LSH+Jaccard pipeline) would be recomputed once per
    # branch — measured ~2× the pair-generation cost on dedup_clusters.
    edges = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).localCheckpoint(eager=True)
    # Small-graph fast path (minlabel/auto only — the "star" entry
    # exists precisely to driver-verify the distributed star rounds,
    # so it never short-circuits): probe the CHECKPOINTED edge list
    # with a bounded limit-collect; if the whole graph fits the edge
    # gate, solve with a driver union-find. Below the gate each
    # distributed round is pure fixed cost (join + agg + checkpoint
    # job on a few thousand rows), and label propagation needs
    # O(diameter) such rounds; the union-find is exact, reads the
    # already-materialized checkpoint, and emits the identical
    # (node, component=min id) labels. At scale the probe returns
    # cap+1 rows from the checkpoint (no recompute) and the
    # distributed loop proceeds untouched.
    # Two-step probe: a bounded COUNT first (one JVM-side long crosses
    # to the driver), then collect only when the graph actually fits —
    # an at-scale graph must never pay Py4J deserialization of
    # cap+1 Rows just to learn it is big. Both jobs read the
    # already-materialized checkpoint.
    if (
        edges.limit(CC_LOCAL_SOLVE_EDGES + 1).count()
        <= CC_LOCAL_SOLVE_EDGES
    ):
        return _components_local(edges.sparkSession, edges.collect())
    sym = edges.union(edges.select(F.col("v"), F.col("u"))).localCheckpoint(
        eager=True
    )
    # init == round 1: label = min(self, direct neighbors), one
    # aggregate, no join (every node appears as u in the symmetric list)
    labels = (
        sym.groupBy(F.col("u").alias("node"))
        .agg(F.min(F.least(F.col("u"), F.col("v"))).alias("label"))
        .localCheckpoint(eager=True)
    )
    n_rounds = (max_iter if algorithm == "minlabel" else diameter_budget) - 1
    converged = False
    for _ in range(n_rounds):
        contrib = sym.join(labels, sym.v == labels.node).select(
            sym.u.alias("node"), "label", F.lit(False).alias("own")
        )
        new_labels = (
            contrib.union(
                labels.select("node", "label", F.lit(True).alias("own"))
            )
            .groupBy("node")
            .agg(
                F.min("label").alias("label"),
                # strictly-smaller neighbor min == this node moved
                (
                    F.min(F.when(~F.col("own"), F.col("label")))
                    < F.min(F.when(F.col("own"), F.col("label")))
                ).alias("_changed"),
            )
            .localCheckpoint(eager=False)
        )
        # The count scans every partition -> materializes the lazy
        # checkpoint in the SAME job (one action per round, vs the
        # previous eager-checkpoint + probe pair).
        changed = new_labels.filter("_changed").count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            converged = True
            break
    if algorithm == "auto" and not converged:
        # Diameter budget exhausted: contract by the partial labels
        # (each label = min of a radius-`budget` ball, so the
        # contracted graph has one node per ball and only inter-ball
        # edges survive) and let the star algorithm finish
        # diameter-independently. Components map back through the
        # partial labels; the contracted min IS the global min since
        # labels are node ids.
        lu = labels.select(F.col("node").alias("u"), F.col("label").alias("lu"))
        lv = labels.select(F.col("node").alias("v"), F.col("label").alias("lv"))
        contracted = (
            sym.join(lu, "u")
            .join(lv, "v")
            .filter(F.col("lu") != F.col("lv"))
            .select(F.col("lu").alias("u"), F.col("lv").alias("v"))
        )
        star = _star_components(contracted, max_iter=max_iter).select(
            F.col("node").alias("label"), F.col("component").alias("root")
        )
        return (
            labels.join(star, "label", "left")
            .select(
                "node", F.coalesce("root", F.col("label")).alias("component")
            )
        )
    return labels.select("node", F.col("label").alias("component"))


def fused_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int | None = None,
) -> DataFrame:
    """BOTH signature families — the ``n_hashes`` MinHash components
    AND both SimHash widths — from ONE zero-shuffle Arrow pass over
    the corpus (r16; r15 VERDICT item 1).

    Every signature is a pure per-document function of the text, so
    the two explode→shuffle→wide-aggregate stages this replaces
    (:func:`minhash_signatures` at 64 hashes: 16 md5 digests per
    exploded shingle row into a 64-column grouped min;
    :func:`simhash_signatures_both`: one md5 per exploded word row
    into 64 conditional sums) moved the word/shingle-count-sized
    intermediate through a hash exchange only to regroup it by the
    document it came from. Here each document's text crosses the
    Python boundary once per batch (guide §4.2), the per-doc work runs
    vectorized (one md5 buffer + one numpy min per doc for the MinHash
    slices; one bit-matrix reduction for the SimHash sums), and only
    doc-count signature rows come back — no explode, NO SHUFFLE: at
    100 TB this removes the corpus-sized exchange entirely and scales
    with the scan's own split count.

    Bit-identical by construction (pinned in
    tests/test_r16_optimization.py against both JVM builders):

    - normalization replicates ``_norm_text`` exactly the way
      :func:`minhash_band_cols_arrow` already does (strip SPACES only
      = Spark ``trim``; lower; collapse ASCII ``\\s+``; keep empty
      words — word_shingles keeps them too);
    - MinHash mins compare raw 4-byte digest slices, which order
      identically to the JVM's 8-hex-char substring strings (hex is a
      monotone byte-wise encoding), and are rendered back to hex;
    - SimHash bit sums are exact integer arithmetic on the same
      per-word ±count contributions (empty words filtered, duplicates
      weighted), with the 64-bit sign bit folded exactly as
      :func:`simhash_signatures_both` does;
    - presence matches the explode semantics: a doc with no shingles
      carries NULL mh columns, a doc with no words NULL simhash —
      the registry projections filter on those markers so each frame
      holds exactly the rows the grouped aggregates produced.
    """
    import hashlib

    import numpy as np

    n_hashes = MINHASH_EST_HASHES if n_hashes is None else n_hashes
    assert n_hashes % 4 == 0, "n_hashes must be a multiple of 4"
    n_dig = n_hashes // 4
    n_words = SHINGLE_WORDS

    id_type = dict(df.dtypes)[id_col]
    schema = ", ".join(
        [f"{id_col} {id_type}"]
        + [f"mh{i} string" for i in range(n_hashes)]
        + ["simhash32 bigint", "simhash64 bigint"]
    )
    cols = (
        [id_col]
        + [f"mh{i}" for i in range(n_hashes)]
        + ["simhash32", "simhash64"]
    )

    def _sigs(pdfs):
        import re as _re
        from collections import Counter

        md5 = hashlib.md5
        ws = _re.compile(r"\s+", _re.ASCII)
        prefixes = [f"{j}:".encode() for j in range(n_dig)]
        bit32 = np.arange(32, dtype=np.uint32)
        shift32 = np.arange(32, dtype=np.int64)
        shift_hi = np.arange(32, 63, dtype=np.int64)
        for pdf in pdfs:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                words = ws.sub(" ", text.strip(" ").lower()).split(" ")
                mh: list[str | None] = [None] * n_hashes
                if len(words) >= n_words:
                    sh = {
                        " ".join(words[i : i + n_words])
                        for i in range(len(words) - n_words + 1)
                    }
                    buf = b"".join(
                        md5(p + s.encode()).digest()
                        for s in sh
                        for p in prefixes
                    )
                    arr = np.frombuffer(buf, dtype=">u4").reshape(
                        len(sh), n_hashes
                    )
                    mh = [
                        int(v).to_bytes(4, "big").hex()
                        for v in arr.min(axis=0)
                    ]
                wc = Counter(w for w in words if w != "")
                if not wc:
                    if mh[0] is None:
                        continue
                    rows.append((did, *mh, None, None))
                    continue
                wl = list(wc)
                hbuf = b"".join(md5(w.encode()).digest()[:8] for w in wl)
                hl = np.frombuffer(hbuf, dtype=">u4").reshape(len(wl), 2)
                cnt = np.fromiter(
                    (wc[w] for w in wl), dtype=np.int64, count=len(wl)
                )
                hbits = ((hl[:, 0][:, None] >> bit32) & 1).astype(np.int64)
                lbits = ((hl[:, 1][:, None] >> bit32) & 1).astype(np.int64)
                hsum = ((2 * hbits - 1) * cnt[:, None]).sum(axis=0)
                lsum = ((2 * lbits - 1) * cnt[:, None]).sum(axis=0)
                s32 = int(((hsum > 0).astype(np.int64) << shift32).sum())
                s64 = int(
                    ((lsum > 0).astype(np.int64) << shift32).sum()
                ) + int(
                    ((hsum[:31] > 0).astype(np.int64) << shift_hi).sum()
                )
                if hsum[31] > 0:
                    s64 -= 1 << 63
                rows.append((did, *mh, s32, s64))
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, text_col).mapInPandas(_sigs, schema)


# ---------------------------------------------------------------------------
# Registry queries
# ---------------------------------------------------------------------------

def dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup summary: every content group with its canonical doc
    and copy count, restricted to groups (ordering-stable)."""
    d = load_table(spark, sf_dir, "documents")
    g = exact_dedup_groups(d)
    return g.select("content_key", "canonical_id", "n_copies")


# ---------------------------------------------------------------------------
# Session-scoped stage cache for the registry's cross-document dedup
# pipeline. Five registry queries consume the same candidate graph
# (candidates, Jaccard verify, both cluster resolutions, the composed
# survivor pass); a production pipeline computes those stages ONCE and
# derives every downstream product from them — recomputing the
# shingle->MinHash->LSH->verify chain per query is a registry artifact,
# not a semantic. Each stage is built lazily on first use, eagerly
# ``localCheckpoint``-ed (stage outputs are pair lists — tiny relative
# to the corpus), and keyed by (application, sf_dir), so the BUILD cost
# is charged to the first consumer and later consumers pay only their
# own derivation. Direct calls to the underlying functions with custom
# inputs/thresholds are never cached.
_STAGE_CACHE: dict[tuple, DataFrame] = {}


def _doc_stage(spark: SparkSession, sf_dir: str, stage: str, build) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, stage)
    df = _STAGE_CACHE.get(key)
    if df is None:
        df = build().localCheckpoint(eager=True)
        _STAGE_CACHE[key] = df
    return df


def build_registry_stage_cache(spark: SparkSession, sf_dir: str) -> dict[str, int]:
    """Force-build the session's shared candidate-graph stages
    (shingle→MinHash→LSH candidates → Jaccard edges → min-label
    components) and return each stage's row count. Exists so the BENCH
    can charge the one-time build to its own named line
    (``dedup_stage_build``) instead of whichever dedup consumer runs
    first — per-query numbers then measure each query's own
    derivation, honestly attributable at a glance. Stages are eagerly
    checkpointed on first build, so the counts here are near-free
    scans of materialized partitions."""
    return {
        "shingles": _registry_shingles(spark, sf_dir).count(),
        # the first signature count builds the ONE fused Arrow pass
        # (r16) that serves every signature consumer: the LSH banding
        # reads the projection's first 12 minhash columns, the Jaccard
        # estimator all 64, the streaming ingest screen the snapshot
        # slice, and both SimHash widths project from the same frame
        "minhash_sigs64": _registry_minhash_sigs(spark, sf_dir).count(),
        "lsh_candidates": _registry_candidates(spark, sf_dir).count(),
        "jaccard_edges": _registry_edges(spark, sf_dir).count(),
        "components_minlabel": _registry_components(spark, sf_dir).count(),
        # projections of the already-materialized fused stage
        "simhash32_sigs": _registry_simhash32(spark, sf_dir).count(),
        "simhash64_sigs": _registry_simhash64(spark, sf_dir).count(),
    }


def _registry_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed (doc_id, shingle) stage — shared by the LSH
    candidate build, the Jaccard verifier, and the containment scorer
    so the corpus is shingled exactly once per session."""
    d = load_table(spark, sf_dir, "documents")
    return _doc_stage(spark, sf_dir, "shingles", lambda: shingle_table(d))


def _registry_signatures_fused(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Checkpointed fused signature stage: one zero-shuffle Arrow pass
    (:func:`fused_signatures`) yields the 64-hash MinHash signature
    AND both SimHash widths per document — the two wide grouped
    aggregates it replaced were the dedup stage build's dominant cost
    (r15 bench: 2.2 s + 2.7 s of the 6.0 s line). The materialized
    stage is doc-count rows of fixed-width strings/bigints — tiny
    relative to the corpus at any scale."""
    d = load_table(spark, sf_dir, "documents")
    return _doc_stage(
        spark,
        sf_dir,
        "signatures_fused",
        lambda: fused_signatures(d, n_hashes=MINHASH_EST_HASHES),
    )


def _registry_minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-hash MinHash projection of the fused signature stage
    (doc_id, mh0..mh63). Hash ``i`` is the i%4-th 8-hex slice of
    ``md5(i//4 || ':' || shingle)`` minimized per doc — independent
    of how many hashes are requested, so the first 12 columns ARE the
    production banding signature and the full 64 are the estimator's.
    One fused pass per session feeds the LSH candidate build, the
    Jaccard-estimator audit, and the streaming ingest screen's
    snapshot band sets (which filter this frame to the snapshot
    slice). The NULL-mh filter reproduces the grouped-aggregate
    presence semantics exactly: docs with no shingles never had a
    signature row."""
    return (
        _registry_signatures_fused(spark, sf_dir)
        .where(F.col("mh0").isNotNull())
        .select(
            "doc_id", *[f"mh{i}" for i in range(MINHASH_EST_HASHES)]
        )
    )


def _registry_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return _doc_stage(
        spark,
        sf_dir,
        "lsh_candidates",
        lambda: lsh_candidate_pairs(
            d, signatures=_registry_minhash_sigs(spark, sf_dir)
        ),
    )


def _registry_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return _doc_stage(
        spark,
        sf_dir,
        "jaccard_0.5",
        lambda: ngram_jaccard_pairs(
            d,
            pairs=_registry_candidates(spark, sf_dir),
            threshold=0.5,
            shingles=_registry_shingles(spark, sf_dir),
        ),
    )


def _registry_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-label connected components over the shared edge stage —
    consumed by both the cluster-assignment query and the composed
    canonical-corpus pass."""
    return _doc_stage(
        spark,
        sf_dir,
        "components_minlabel",
        lambda: connected_components(
            _registry_edges(spark, sf_dir).select("id_a", "id_b")
        ),
    )


def dedup_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs on documents."""
    return _registry_candidates(spark, sf_dir)


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard over LSH candidates, thresholded at 0.5."""
    return _registry_edges(spark, sf_dir)


def dedup_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: the EXACT similarity self-join (prefix
    filtering) at Jaccard >= 0.5 over the shared shingle stage — the
    zero-recall-loss alternative to the LSH banding, oracle-checked
    against the full common-shingle ground truth."""
    d = load_table(spark, sf_dir, "documents")
    return prefix_filter_jaccard_pairs(
        d, threshold=0.5, shingles=_registry_shingles(spark, sf_dir)
    )


def _registry_simhash_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOTH-width SimHash projection of the fused signature stage (one
    bigint per width per doc; values bit-identical to
    :func:`simhash_signatures_both`, pinned in
    tests/test_r16_optimization.py). Caching the signature table is
    cheap where caching the WORD-hash table was measured too expensive
    (r05/r06 — word-count-sized I/O vs the parallel explode+md5
    recompute): the expensive upstream runs exactly once per session,
    and the checkpoint materializes only doc-count rows. It also
    removes the 64-bit band self-join's double execution of the
    signature aggregation structurally: both join branches read the
    materialized stage instead of relying on exchange reuse. The
    NULL-simhash filter reproduces the grouped-aggregate presence
    semantics: docs with no (non-empty) words never had a row."""
    return (
        _registry_signatures_fused(spark, sf_dir)
        .where(F.col("simhash32").isNotNull())
        .select("doc_id", "simhash32", "simhash64")
    )


def _registry_simhash32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit projection of the shared both-width signature stage."""
    return _registry_simhash_both(spark, sf_dir).select(
        "doc_id", "simhash32"
    )


def _registry_simhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit projection of the shared both-width signature stage."""
    return _registry_simhash_both(spark, sf_dir).select(
        "doc_id", "simhash64"
    )


def dedup_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signature per document (shared session stage)."""
    return _registry_simhash32(spark, sf_dir)


def dedup_cluster_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: connected components over the verified
    near-dup pair graph (Jaccard ≥ 0.5 on LSH candidates). One row per
    clustered doc with its component id (= min doc_id in the cluster,
    the canonical survivor)."""
    cc = _registry_components(spark, sf_dir)
    return cc.select(F.col("node").alias("doc_id"), "component")


#: Holdout modulus for the leakage-safe split: cluster roots with
#: ``root % 5 == 0`` go to holdout (~20%), the rest to train. The
#: rule is engine-agnostic integer arithmetic on the CLUSTER ROOT
#: (min doc_id of the near-dup cluster; a singleton's root is
#: itself) — deterministic, oracle-replayable, and leakage-safe by
#: construction: every member of a cluster shares its root, so
#: near-duplicate documents can never straddle the split.
SPLIT_HOLDOUT_MOD = 5


def docs_leakage_safe_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Registry query: the LEAKAGE-SAFE train/holdout split (SURVEY
    §7.11) — the contamination guard a training pipeline runs before
    any evaluation: a naive per-document split leaks whenever two
    near-duplicate documents land on opposite sides (the model is
    then evaluated on paraphrases of its training data), so the
    split assigns BY DEDUP CLUSTER — each document inherits its
    cluster root (the canonical min-doc_id survivor; singletons are
    their own root) and the whole cluster goes where its root goes
    (holdout iff ``root % SPLIT_HOLDOUT_MOD == 0``).

    Returns one row per side: ``(side, n_docs, n_clusters,
    sum_doc_id)`` — the checksum makes the oracle verify the exact
    per-document assignment, not just the counts.

    Shape: the cluster mapping is the session-cached component stage
    (aggregate-sized, its build cost is the `dedup_stage_build`
    line); the split is one broadcast-ish left join of documents
    against that mapping plus a map-side-combined two-group
    aggregate. At 100 TB the mapping join shuffles on doc_id like
    every other stage consumer; the assignment rule itself moves no
    data (pure arithmetic on the root)."""
    comp = dedup_cluster_assignments(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    allmap = docs.join(comp, "doc_id", "left_outer").select(
        "doc_id",
        F.coalesce("component", "doc_id").alias("root"),
    )
    side = (
        F.when(
            F.col("root") % SPLIT_HOLDOUT_MOD == 0, F.lit("holdout")
        )
        .otherwise(F.lit("train"))
        .alias("side")
    )
    return allmap.groupBy(side).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("root").alias("n_clusters"),
        F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
    )


def dedup_cluster_assignments_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same duplicate-cluster semantics as
    :func:`dedup_cluster_assignments`, resolved by the large-star/
    small-star algorithm instead of min-label propagation. Registered
    separately so the DIAMETER-INDEPENDENT fallback path is
    driver-verified against the identical oracle — the component
    labels are algorithm-invariant (min doc_id per cluster)."""
    edges = _registry_edges(spark, sf_dir).select("id_a", "id_b")
    cc = connected_components(edges, algorithm="star")
    return cc.select(F.col("node").alias("doc_id"), "component")


#: Session memo for the BOUNDED fast-path probe the registry entry
#: feeds to ``embedding_cosine_pairs(n_rows=...)`` — without it every
#: construction (each bench warm run, every explain) pays the eager
#: ``limit(cap+1).count()`` probe as its own Spark job (the round-10
#: ADVICE item the parameter exists for; the ingest screen's
#: `_SCREEN_PROBE_CACHE` is the same idiom). The cached value is the
#: limit-capped count itself (exact when <= cap, cap+1 when over), so
#: the gate decision is bit-identical to the un-memoized probe and the
#: first call never scans more than cap+1 rows — a full ``count()``
#: here would schedule a whole-table job on the 100 TB path before any
#: plan is returned. Like every (app, sf_dir)-keyed memo in this
#: engine, it assumes the registry tables are immutable within an
#: application.
_EMB_PROBE_CACHE: dict[tuple, int] = {}


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs at cos >= 0.3 via LSH blocking —
    the sub-quadratic scale path is the registry default; the exact
    block-matmul baseline backs the recall test in tests/test_dedup.py.
    The oracle reproduces the same seeded hyperplanes as SQL literals,
    so this is hash-checked pair-for-pair despite being approximate."""
    e = load_table(spark, sf_dir, "embeddings")
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _EMB_PROBE_CACHE:
        _EMB_PROBE_CACHE[key] = e.limit(
            COSINE_SINGLE_BATCH_CAP + 1
        ).count()
    return embedding_cosine_pairs(
        e,
        threshold=0.3,
        use_lsh_blocking=True,
        n_rows=_EMB_PROBE_CACHE[key],
    )


def semantic_dedup(
    embeddings: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    threshold: float = 0.3,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540 — public method): cluster the embedding space
    with k-means, then compare vectors ONLY within their cluster and
    mark every vector that has a higher-priority (lower vec_id)
    in-cluster neighbor above the cosine threshold as a duplicate of
    its lowest such neighbor. One row per vector: (vec_id, cid,
    dup_of, kept).

    vs :func:`embedding_cosine_pairs`: same "near-duplicate by
    embedding cosine" goal, different blocking — k-means cells instead
    of LSH buckets (SemDeDup's defining trick: semantically close
    points share a centroid, so candidate pairs are cluster-local).

    Scale: the k-means pass is the fused-round Lloyd loop
    (vector._lloyd_iterate — one job per round, k×dim driver
    broadcast); the pair stage compares vectors cluster-locally
    (cost Σ|cluster|²) — at corpus scale k grows with n to bound
    cluster sizes (SemDeDup uses ~100k clusters for web corpora),
    keeping the stage subquadratic. Scoring runs per cluster in one
    applyInPandas pass (each vector crosses the Python boundary once,
    candidates come back as scalars — see the inline r15 note); every
    cosine is the same order-preserving left fold, so the whole
    operator is hash-checkable against an oracle that unrolls the
    same trajectory."""
    from inf2106_map_reduce_spark.functions import vector

    if assigned is None:
        e = embeddings.select("vec_id", F.col("embedding").alias("emb"))
        cents = [
            [float(x) for x in r["c"]]
            for r in e.filter(F.col("vec_id") < k)
            .orderBy("vec_id")
            .select(
                F.transform(
                    F.transform(F.col("emb"), lambda x: x.cast("double")),
                    lambda x: F.round(x, 9),
                ).alias("c")
            )
            .collect()
        ]
        assigned, _, _, _ = vector._lloyd_iterate(e, cents, n_rounds=n_iter)
        # referenced three times below
        a = assigned.localCheckpoint(eager=True)
    else:
        # pre-computed (and already checkpointed) session assignment
        # stage — the registry path, shared with kmeans_clusters
        a = assigned
    # r15 OPTIMIZATION (guide §8 "shuffle keys and metadata instead of
    # payloads" / §4.2): the pair stage used to equi-join the
    # assignment against itself on cid and ship BOTH embeddings of
    # every within-cluster pair through the cosine pandas UDF —
    # O(Σ|cluster|² · dim) doubles across the JVM↔Python boundary
    # (~256 MB at sf0.1 for a 1 MB corpus). Each cluster's vectors now
    # cross ONCE (applyInPandas per cid), pairwise cosines are
    # computed in-group with the IDENTICAL IEEE arithmetic as
    # vector.cosine_batch — np.add.accumulate along the dim axis is
    # the same sequential left fold per pair, per-vector norms are the
    # same doubles the per-pair fold produced (same input, same ops;
    # x*y and na*nb are commutative IEEE multiplies) — and only
    # CANDIDATE SCALARS (vec_id, nb_id, cos) come back. The exact
    # rounded threshold decision stays JVM-side: the group emits every
    # pair with cos >= threshold − 1e-6 (F.round is HALF_UP, so a
    # qualifying pair has cos >= threshold − 5e-7; the margin is
    # strictly wider) and the same F.round(cos, 6) >= threshold filter
    # as before makes every boundary call on the bit-identical double.
    # Measured at sf0.1: warm 2.6 s → sub-second, and the first-touch
    # Arrow volume collapses with it.
    thr = float(threshold)

    def _pair_scores(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype="int64"),
                    "nb_id": pd.Series([], dtype="int64"),
                    "cos": pd.Series([], dtype="float64"),
                }
            )
        order = np.argsort(pdf["vec_id"].to_numpy(), kind="stable")
        ids = pdf["vec_id"].to_numpy()[order]
        x = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf["emb"].to_numpy()[order]]
        )
        # per-vector norms: same accumulate fold + sqrt as the
        # per-pair UDF computed on the identical vector
        norms = np.sqrt(np.add.accumulate(x * x, axis=1)[:, -1])
        out_v: list[np.ndarray] = []
        out_n: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        # chunk the higher-id side so transient memory stays bounded
        # at chunk × n × dim doubles regardless of cluster size
        chunk = max(1, 2_000_000 // (n * x.shape[1] or 1))
        for s in range(1, n, chunk):
            e = min(n, s + chunk)
            # pairs (j, i) with j < i for i in [s, e): the fold over
            # x_i * x_j along dims is cosine_batch's exact left fold
            d = np.add.accumulate(
                x[s:e, None, :] * x[None, :, :], axis=2
            )[:, :, -1]
            cos = d / (norms[s:e, None] * norms[None, :])
            ii, jj = np.nonzero(
                (np.arange(n)[None, :] < np.arange(s, e)[:, None])
                & (cos >= thr - 1e-6)
            )
            out_v.append(ids[ii + s])
            out_n.append(ids[jj])
            out_c.append(cos[ii, jj])
        return pd.DataFrame(
            {
                "vec_id": pd.Series(np.concatenate(out_v), dtype="int64"),
                "nb_id": pd.Series(np.concatenate(out_n), dtype="int64"),
                "cos": pd.Series(np.concatenate(out_c), dtype="float64"),
            }
        )

    cand = (
        a.select("cid", "vec_id", "emb")
        .groupBy("cid")
        .applyInPandas(_pair_scores, schema="vec_id long, nb_id long, cos double")
    )
    dup_of = (
        cand.filter(F.round(F.col("cos"), 6) >= F.lit(threshold))
        .groupBy("vec_id")
        .agg(F.min("nb_id").alias("dup_of"))
    )
    return (
        a.join(dup_of, "vec_id", "left")
        .select(
            "vec_id",
            "cid",
            "dup_of",
            F.col("dup_of").isNull().alias("kept"),
        )
    )


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: SemDeDup over the embeddings table (k=8, 2
    Lloyd rounds, cosine >= 0.3 within cluster). The Lloyd assignment
    comes from the shared session stage (identical deterministic
    trajectory to kmeans_clusters — computed once, consumed by
    both)."""
    from inf2106_map_reduce_spark.functions import vector

    return semantic_dedup(
        load_table(spark, sf_dir, "embeddings"),
        assigned=vector.registry_lloyd_assignment(spark, sf_dir),
    )


def dedup_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog compaction: keep only the newest event per
    (user_id, event_type) — ROW_NUMBER over ts DESC with event_id as a
    deterministic tiebreaker. The standard "latest version of each
    record" pass a CDC/snapshot pipeline runs before training-data
    export (reference analogue: last-writer-wins on the reduce key,
    `servant/ReduceTaskServant.java:263-301` group scan).

    Scale: one shuffle on the compaction key; the window sort is
    per-partition with managed spill, and the rn=1 filter collapses
    each group before anything leaves the stage — output is bounded by
    key cardinality, not event count.
    """
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


def simhash_candidate_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Complete the SimHash pipeline: near-dup PAIRS within Hamming
    distance ``max_hamming`` of each other's 32-bit signature.

    Pigeonhole blocking: split the signature into 4 disjoint 8-bit
    bands — any pair differing in <= 3 bits must agree EXACTLY on at
    least one band, so candidates come from 4 equi-joins on (band,
    value), never an all-pairs scan (same shuffle-bounded shape as the
    MinHash LSH banding; recall is exact by the pigeonhole argument,
    not probabilistic). Verification is one ``bit_count(xor)`` per
    candidate.

    Scale: band values are 8-bit so bucket sizes ~n/256 per band;
    the verify stage touches candidates only. For the 64-bit variant
    (8x8-bit bands, <=7-bit guarantee) see
    :func:`simhash64_candidate_pairs`.
    """
    sigs = simhash(df, id_col, text_col)
    return _hamming_banded_pairs(sigs, "simhash32", 4, max_hamming, id_col)


def _hamming_banded_pairs(
    sigs: DataFrame,
    sig_col: str,
    n_bands: int,
    max_hamming: int,
    id_col: str,
) -> DataFrame:
    """Pigeonhole band join + Hamming verify over precomputed
    signatures: explode into ``n_bands`` disjoint 8-bit bands,
    equi-join on (band, value), verify with one ``bit_count(xor)``.
    Exact recall for Hamming <= n_bands - 1 (a pair differing in fewer
    bits than there are bands must agree on one band). Arithmetic
    shiftright on a negative (sign-bit-set) signature is masked by
    ``& 255``, so band values are the true unsigned bytes — matching
    DuckDB's ``(s >> (8*i)) & 255`` in the oracles.

    No checkpoint needed despite the self-join referencing the
    signature aggregation twice: Spark reuses the aggregation's
    exchange across both branches (ReusedExchange — verified; an
    explicit localCheckpoint measured no faster)."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftright(F.col(sig_col), 8 * b)
                .bitwiseAND(F.lit(255))
                .alias("band_val"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = sigs.select(
        F.col(id_col), F.col(sig_col), F.explode(bands).alias("band")
    ).select(id_col, sig_col, "band.band_idx", "band.band_val")
    a = exploded.alias("a")
    b = exploded.alias("b")
    hamming = F.bit_count(
        F.col("sa").bitwiseXOR(F.col("sb"))
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{sig_col}").alias("sa"),
            F.col(f"b.{sig_col}").alias("sb"),
        )
        .distinct()
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash — the corpus-scale precision variant of
    :func:`simhash`. At 32 bits, random-doc collisions within Hamming 3
    become common past ~10M docs; 64 bits pushes that out past any
    realistic corpus.

    Word hash is the first 16 hex chars of md5 taken as two 32-bit
    halves (hi/lo) so every intermediate fits a signed bigint in both
    Spark and DuckDB; bit 63 of the signature is the bigint sign bit
    (added as -2^63 — exact two's-complement, no overflow in either
    engine). Same plan shape as the 32-bit version: one explode + one
    grouped aggregation, no UDF.

    Rewrites measured at sf0.1: packing the 64 bit-sums into 32
    two-lane bigints (REJECTED r05 — no gain); pre-aggregating
    (doc, word) counts before hashing (REJECTED r05 — the extra
    shuffle outweighs the md5 dedup); computing the bit-sum partials
    in a vectorized numpy ``mapInPandas`` pass (REJECTED r08 — the
    Arrow round trip alone measured ~7 s against this word table,
    3× the entire SQL aggregation; the JVM agg was never the cost).
    The single explode + single agg remains the measured optimum —
    the r08 win is upstream, in :func:`simhash64_candidate_pairs`,
    which now checkpoints the doc-count-sized signature table so the
    band self-join stops running this stage twice.
    """
    exploded = word_hash_table(df, id_col, text_col)
    def _src(j: int):
        return (
            F.shiftright(F.col("lo"), j)
            if j < 32
            else F.shiftright(F.col("hi"), j - 32)
        )
    bit_sums = [
        F.sum(
            F.when(_src(j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(64)
    ]
    agg = exploded.groupBy(id_col).agg(*bit_sums)
    sig = reduce(
        lambda acc, j: acc
        + F.when(
            F.col(f"b{j}") > 0,
            F.lit(2**j if j < 63 else -(2**63)).cast("bigint"),
        ).otherwise(F.lit(0)),
        range(64),
        F.lit(0).cast("bigint"),
    )
    return agg.select(F.col(id_col), sig.alias("simhash64"))


def simhash64_candidate_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """64-bit SimHash near-dup pairs: 8 disjoint 8-bit bands give exact
    recall up to Hamming 7 (pigeonhole) — run at the same default
    ``max_hamming=3`` as the 32-bit entry so precision improves while
    the contract stays comparable. Band buckets are ~n/256 per band as
    before; candidate volume drops vs 32-bit because random 8-bit band
    collisions now require agreement on genuinely more entropy."""
    sigs = simhash64(df, id_col, text_col)
    return _hamming_banded_pairs(sigs, "simhash64", 8, max_hamming, id_col)


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: SimHash near-dup pairs at Hamming <= 3, banded
    over the shared 32-bit signature stage."""
    sigs = _registry_simhash32(spark, sf_dir)
    return _hamming_banded_pairs(sigs, "simhash32", 4, 3, "doc_id")


def dedup_simhash64_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: 64-bit SimHash near-dup pairs at Hamming <= 3
    (8x8-bit pigeonhole bands), banded over the shared 64-bit
    signature stage."""
    sigs = _registry_simhash64(spark, sf_dir)
    return _hamming_banded_pairs(sigs, "simhash64", 8, 3, "doc_id")


def dedup_canonical_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup removal: the corpus that SURVIVES the full
    dedup pipeline (shingle -> MinHash -> LSH bands -> exact Jaccard
    verify -> connected components -> keep the min-doc_id canonical per
    cluster). This is the pass a training-data pipeline actually ships
    — the earlier registry entries expose its stages; this one is the
    composed product.

    Scale: identical to the stage costs (the pipeline reuses the same
    bucketed-join shapes); the final keep-filter is a broadcast-able
    anti join — the losers list is |clustered docs - clusters| rows,
    tiny relative to the corpus even at 100 TB duplicate rates.
    """
    d = load_table(spark, sf_dir, "documents")
    cc = _registry_components(spark, sf_dir)
    losers = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("loser_id")
    )
    return (
        d.join(losers, d.doc_id == F.col("loser_id"), "left_anti")
        .select("doc_id", "lang", "source", "n_chars")
    )


# ---------------------------------------------------------------------------
# Exact-substring (duplicate-span) dedup
# ---------------------------------------------------------------------------

SPAN_WINDOW = 10


def duplicate_span_report(
    df: DataFrame,
    window: int = SPAN_WINDOW,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring dedup report: the scalable restatement of
    suffix-array substring dedup (Lee et al., "Deduplicating Training
    Data Makes Language Models Better", ACL'22). Any ``window``-word
    sequence that occurs more than once in the corpus — across OR
    within documents — marks its positions; runs of consecutive
    duplicated window starts merge into maximal spans (exactly the
    >= window-length repeated substrings the suffix array would find).
    Per document: total windows, duplicated windows, merged span
    count, longest span, and duplicated word mass — the
    remove-or-keep signal for substring-level cleanup.

    Span semantics: two duplicated windows belong to the same span
    when their COVERAGE is contiguous — start gap <= window (overlap
    or adjacency) — so ``n_dup_words`` is the true union word mass
    (never exceeds the document length) and ``n_spans`` counts maximal
    contiguous duplicated regions.

    Plan: one tokenize pass builds all sliding windows JVM-side
    (transform over a sequence + slice — no Python), one shuffle
    groups window hashes to find repeats (map-side partial agg
    applies), one join marks positions, and the gaps-and-islands merge
    is a per-doc window (shuffle on doc_id). Everything is linear in
    corpus size; nothing is pairwise.

    Scale: the windows table is ~window x token count rows of
    (id, hash); the hash is ``xxhash64`` — a JVM intrinsic producing
    an 8-byte long shuffle key (vs 32-char md5 hex: 4x fewer shuffle
    bytes and no hex encode). The hash only carries EQUALITY — which
    windows collide — so the DuckDB oracle grouping by md5 (or by the
    raw window text) computes the identical report; no cross-engine
    hash parity is needed, unlike the content-fingerprint operators.
    The repeat table is Zipf-small and the join keys are hashes, so
    AQE's skew split handles pathological boilerplate.
    """
    words = F.split(_norm_text(text_col), " ")
    wins_arr = F.when(
        F.size(words) >= window,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - window),
            lambda i: F.struct(
                i.alias("pos"),
                F.xxhash64(
                    F.concat_ws(" ", F.slice(words, i + 1, window))
                ).alias("wh"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,wh:bigint>>"))
    # the windows table feeds three plan subtrees (repeat aggregate,
    # mark join, totals): checkpoint once instead of re-tokenizing the
    # corpus three times — the same multi-consumer shape (and fix) as
    # ngram_jaccard_pairs' shingle table
    w = (
        df.select(id_col, F.explode(wins_arr).alias("w"))
        .select(id_col, F.col("w.pos").alias("pos"), F.col("w.wh").alias("wh"))
        .localCheckpoint(eager=True)
    )
    dup = w.groupBy("wh").agg(F.count(F.lit(1)).alias("n_occ")).filter(
        F.col("n_occ") >= 2
    )
    marked = w.join(dup.select("wh"), "wh")
    w_doc = Window.partitionBy(id_col).orderBy("pos")
    lagged = marked.withColumn("_prev", F.lag("pos").over(w_doc))
    brk = F.when(F.col("pos") - F.col("_prev") > window, 1).otherwise(0)
    spans = (
        lagged.withColumn("grp", F.sum(brk).over(w_doc))
        .groupBy(id_col, "grp")
        .agg(
            F.min("pos").alias("s"),
            F.max("pos").alias("e"),
            F.count(F.lit(1)).alias("nw"),
        )
    )
    rep = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("nw").alias("n_dup_windows"),
        F.max(F.col("e") - F.col("s") + window).alias("max_span_len"),
        F.sum(F.col("e") - F.col("s") + window).alias("n_dup_words"),
    )
    tot = w.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_windows"))
    zero = F.lit(0).cast("long")
    return (
        df.select(id_col)
        .join(tot, id_col, "left")
        .join(rep, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_windows", zero).alias("n_windows"),
            F.coalesce("n_dup_windows", zero).alias("n_dup_windows"),
            F.coalesce("n_spans", zero).alias("n_spans"),
            F.coalesce("max_span_len", F.lit(0)).alias("max_span_len"),
            F.coalesce("n_dup_words", zero).alias("n_dup_words"),
        )
    )


def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: 10-word duplicate-span report over documents."""
    return duplicate_span_report(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# PageRank over the near-dup similarity graph
# ---------------------------------------------------------------------------

PAGERANK_ROUNDS = 3
PAGERANK_DAMPING = 0.85


def pagerank(
    edges: DataFrame,
    rounds: int = PAGERANK_ROUNDS,
    damping: float = PAGERANK_DAMPING,
) -> DataFrame:
    """Fixed-round PageRank over an undirected edge list (id_a, id_b)
    — document-importance scoring on the near-dup similarity graph, the
    data-curation signal that ranks canonical/"central" documents above
    satellites inside a duplicate neighborhood. Restricted to the
    graph's non-isolated nodes (symmetric edges mean every node has
    in-edges, so no dangling-mass redistribution is needed).

    Each round is one shuffle: contributions r/deg flow over the edge
    list, group per target, and fold in source-sorted order with
    per-term rounding to 9 — the k-means determinism recipe applied to
    a graph iteration, so the whole trajectory is exactly
    SQL-mirrorable (queries.py unrolls the same rounds as CTEs).

    Scale: cost per round = one edge-table shuffle (E rows); rounds are
    a fixed constant (importance scores converge fast on shallow dup
    graphs). Degrees and N are computed once; N broadcasts as a scalar.
    """
    # canonicalize: one row per unordered pair regardless of input
    # orientation/duplication — a pre-symmetrized or duplicated edge
    # list would otherwise double every degree and contribution,
    # silently breaking the SQL-mirrored trajectory
    pairs = (
        edges.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .distinct()
    )
    # sym and deg feed every round (and deg the epilogue); ranks'
    # lineage would otherwise compound one join+agg per round — the
    # iterative-algorithm checkpoint discipline (same as k_core),
    # keeping each round's plan constant-depth
    sym = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .union(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
        eager=True
    )
    n = deg.agg(F.count(F.lit(1)).alias("n"))
    ranks = deg.crossJoin(F.broadcast(n)).select(
        F.col("u").alias("id"), (F.lit(1.0) / F.col("n")).alias("r")
    )
    base = F.lit(1 - damping) / F.col("n")
    for _ in range(rounds):
        contribs = (
            sym.join(ranks, ranks.id == sym.u)
            .join(deg, "u")
            .select(
                F.col("v").alias("id"),
                F.col("u"),
                F.round(F.col("r") / F.col("deg"), 9).alias("c"),
            )
        )
        folded = contribs.groupBy("id").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("u", "c"))),
                F.lit(0.0),
                lambda acc, s: acc + s["c"],
            ).alias("s")
        )
        ranks = (
            folded.crossJoin(F.broadcast(n))
            .select("id", F.round(base + damping * F.col("s"), 9).alias("r"))
            .localCheckpoint(eager=True)
        )
    return (
        ranks.join(deg, ranks.id == deg.u)
        .select(
            F.col("id").alias("doc_id"),
            F.col("deg").alias("degree"),
            F.round(F.col("r"), 6).alias("pagerank"),
        )
    )


def docs_pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: 3-round PageRank over the shared near-dup
    Jaccard>=0.5 edge stage (the sixth consumer of the session's
    candidate-graph cache)."""
    return pagerank(_registry_edges(spark, sf_dir).select("id_a", "id_b"))


#: Fixed synchronous label-propagation rounds: communities on the
#: shallow near-dup graph stabilize in 2-3 rounds; a fixed count keeps
#: the trajectory SQL-unrollable (the convergence-driven form would
#: stop data-dependently and the oracle could not mirror it).
LPA_ROUNDS = 3


def label_propagation(edges: DataFrame, rounds: int = LPA_ROUNDS) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007, Phys. Rev. E — public method) over an undirected edge
    list: labels start as node ids; each round every node adopts the
    MODE of its neighbors' labels (ties → smallest label). The
    community member of the graph family — distinct from connected
    components (min-label/star, which merge everything reachable):
    LPA splits a component along its dense sub-neighborhoods, the
    "which docs form a tight paraphrase cluster inside this giant
    near-dup component" curation question.

    Determinism: the update is pure integer arithmetic with a total
    tie order (count DESC, label ASC), so the whole trajectory — not a
    fixed point — is exactly SQL-mirrorable, unlike classic
    random-order asynchronous LPA.

    Scale: one edge-keyed shuffle + one grouped arg-max per round;
    labels are re-checkpointed per round (the PageRank lineage
    discipline — constant-depth plans). Symmetric edges mean every
    node has >= 1 neighbor, so the mode always exists.
    """
    pairs = (
        edges.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .distinct()
    )
    sym = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .union(
            pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
        )
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select("u")
        .distinct()
        .select(F.col("u").alias("node"), F.col("u").alias("label"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("u").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(rounds):
        counts = (
            sym.join(labels, labels.node == sym.v)
            .groupBy("u", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("u").alias("node"), "label")
            .localCheckpoint(eager=True)
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("community")
    )


def _registry_lpa_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 3-round LPA partition over the shared edge stage, computed
    ONCE per session (the `_doc_stage` idiom) — consumed by both the
    labelprop entry and its modularity audit, which would otherwise
    replay the identical deterministic trajectory."""
    return _doc_stage(
        spark,
        sf_dir,
        "lpa_labels",
        lambda: label_propagation(
            _registry_edges(spark, sf_dir).select("id_a", "id_b")
        ),
    )


def docs_communities_labelprop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: 3-round synchronous LPA communities over the
    shared near-dup Jaccard>=0.5 edge stage."""
    return _registry_lpa_labels(spark, sf_dir)


def modularity(edges: DataFrame, labels: DataFrame | None = None) -> DataFrame:
    """Newman modularity of a community partition over an undirected
    edge list — the quality audit of :func:`label_propagation` (Newman
    & Girvan 2004, Phys. Rev. E — public method): per community ``c``,
    ``Q_c = e_c/m − (d_c/2m)²`` (internal-edge fraction minus the
    random-graph expectation of it), summed to the partition score
    ``Q``. High Q = the near-dup graph has real dense sub-structure
    worth splitting; Q ≈ 0 = the LPA split is noise and min-label
    components were already the right grain — exactly the go/no-go a
    curation pipeline needs before trusting community-level decisions.
    One row per community: ``(community, n_nodes, internal_edges,
    degree_sum, contribution, modularity)`` with the partition Q
    repeated (the flat-frame convention).

    ``labels`` defaults to the 3-round LPA partition of the same
    edges (recomputed — the trajectory is deterministic, so the
    labels bit-match the labelprop entry's).

    Scale: every label join is a plain id-keyed equi-join — the label
    frame is one row PER NODE of the near-dup graph, which grows with
    the corpus, so it must never be hint-forced to broadcast (the
    round-9 version did; at 100 TB that is an executor/driver OOM —
    the inverse of the forgot-to-broadcast anti-pattern; AQE still
    broadcasts it when genuinely small, so test-SF plans are
    unchanged). The only broadcast/crossJoin frames are the two 1-row
    aggregates ``m`` and ``Q`` (the pagerank scalar idiom), and the
    partition Q is that 1-row aggregate over the localCheckpointed
    per-community frame — no single-partition window anywhere, so no
    one-task serial stage when the graph has millions of communities.

    Determinism: m, degrees, internal counts are exact integers; each
    contribution is the identical fixed-structure double expression on
    both engines; the ≤ #communities-term Q sum's partial-merge order
    jitter is ~1e-14, invisible at the round-6 output quantum (equal
    oracle hash before/after the round-10 aggregate rewrite,
    verified by the full parity suite)."""
    pairs = (
        edges.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if labels is None:
        labels = label_propagation(pairs)
    lab = labels.select(
        F.col("doc_id").alias("node"), F.col("community").alias("label")
    )
    sym = pairs.select(F.col("id_a").alias("u")).union(
        pairs.select(F.col("id_b").alias("u"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("k"))
    m_ = pairs.agg(F.count(F.lit(1)).cast("long").alias("m"))
    internal = (
        pairs.join(
            lab.select(F.col("node").alias("id_a"), "label"),
            "id_a",
        )
        .join(
            lab.select(
                F.col("node").alias("id_b"), F.col("label").alias("_lb")
            ),
            "id_b",
        )
        .filter(F.col("label") == F.col("_lb"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("internal_edges"))
    )
    dsum = (
        lab.join(deg, lab.node == deg.u)
        .groupBy("label")
        .agg(
            F.sum("k").cast("long").alias("degree_sum"),
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
        )
    )
    half = F.col("degree_sum").cast("double") / (F.lit(2) * F.col("m"))
    per = (
        dsum.join(internal, "label", "left")
        .crossJoin(F.broadcast(m_))
        .select(
            F.col("label").alias("community"),
            "n_nodes",
            F.coalesce("internal_edges", F.lit(0).cast("long")).alias(
                "internal_edges"
            ),
            "degree_sum",
            (
                F.coalesce("internal_edges", F.lit(0).cast("long")).cast(
                    "double"
                )
                / F.col("m")
                - half * half
            ).alias("_contrib"),
        )
        # Materialized once so the 1-row Q aggregate below does not
        # re-run the edge joins (the bounded frame is ≤ #communities
        # rows — the same class as the checkpointed ``pairs`` above).
        .localCheckpoint(eager=True)
    )
    # Partition Q as a 1-row aggregate broadcast back (the ``m_``
    # idiom above) — NOT a Window.partitionBy() sum, which is a
    # single-task serial stage over the whole per-community frame.
    q_ = per.agg(F.sum("_contrib").alias("_q"))
    return (
        per.crossJoin(F.broadcast(q_))
        .select(
            "community",
            "n_nodes",
            "internal_edges",
            "degree_sum",
            F.round("_contrib", 6).alias("contribution"),
            F.round("_q", 6).alias("modularity"),
        )
        .orderBy("community")
    )


def docs_communities_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: Newman modularity of the 3-round LPA partition
    over the shared near-dup edge stage (labels from the shared
    session LPA stage — one trajectory serves both entries)."""
    return modularity(
        _registry_edges(spark, sf_dir).select("id_a", "id_b"),
        labels=_registry_lpa_labels(spark, sf_dir),
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle count and local clustering coefficient over an
    undirected edge list ``(id_a, id_b)`` — the duplicate-neighborhood
    density audit. On the near-dup similarity graph a high clustering
    coefficient marks tight cliques (template families, mirrored
    sites) where keeping one canonical doc is safe, while low
    clustering flags chain-like neighborhoods where transitive
    "duplicates" may not actually resemble each other — exactly the
    cases where min-label components over-merge.

    Scale: edges are oriented toward the higher ``(degree, id)`` rank
    before the wedge self-join, so each node's join fan-out is its
    OUT-degree — bounded by O(sqrt(E)) on any graph (the standard
    arboricity/degeneracy argument behind distributed triangle
    enumeration). Without orientation a hub of degree d contributes
    d^2 wedges; with it, a hub receives most edges inbound and its
    wedge count collapses. Three shuffles total: degree agg, wedge
    self-join, closing-edge join — never an all-pairs pass.

    Determinism: pure integer counts plus one final rounded division;
    orientation affects the join order, never the result.
    """
    # pairs and (below) oriented are each consumed by several plan
    # branches; materialize them so the canonicalizing distinct and the
    # rank joins run once instead of once per branch (union/join
    # branches get no common-subtree elimination)
    pairs = (
        edges.select(
            F.least("id_a", "id_b").alias("a"),
            F.greatest("id_a", "id_b").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = pairs.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
        pairs.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # rank = (deg, id): a total order putting hubs last, so orienting
    # every edge toward the higher rank bounds out-degrees
    rank = deg.select(
        F.col("u").alias("n"),
        F.struct(F.col("deg"), F.col("u").alias("id")).alias("k"),
    )
    withk = (
        pairs.join(rank.withColumnRenamed("n", "a").withColumnRenamed("k", "ka"), "a")
        .join(rank.withColumnRenamed("n", "b").withColumnRenamed("k", "kb"), "b")
    )
    flip = F.col("ka") > F.col("kb")
    oriented = withk.select(
        F.when(flip, F.col("b")).otherwise(F.col("a")).alias("src"),
        F.when(flip, F.col("a")).otherwise(F.col("b")).alias("dst"),
        F.when(flip, F.col("ka")).otherwise(F.col("kb")).alias("dst_k"),
    ).localCheckpoint(eager=True)
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    # each triangle {x,y,z} (rank x < y < z) appears exactly once: the
    # apex x holds both out-edges, and the wedge closes iff y->z exists
    wedges = o1.join(
        o2,
        (F.col("o1.src") == F.col("o2.src"))
        & (F.col("o1.dst_k") < F.col("o2.dst_k")),
    ).select(
        F.col("o1.src").alias("x"),
        F.col("o1.dst").alias("y"),
        F.col("o2.dst").alias("z"),
    )
    closing = oriented.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    tris = wedges.join(closing, ["y", "z"])
    # explode, not a 3-way union: union branches get no common-subtree
    # elimination, so each would replicate the entire wedge-join
    # subtree (measured 97 Exchanges in the static plan vs 12 here)
    per_node = (
        tris.select(F.explode(F.array("x", "y", "z")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    t = F.coalesce(F.col("t"), F.lit(0)).cast("bigint")
    return deg.join(per_node, deg.u == per_node.n, "left").select(
        F.col("u").alias("doc_id"),
        F.col("deg").alias("degree"),
        t.alias("triangles"),
        F.round(
            F.when(
                F.col("deg") >= 2,
                F.lit(2.0) * t / (F.col("deg") * (F.col("deg") - 1)),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("clustering"),
    )


def docs_neardup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: triangle counts + clustering coefficient over
    the shared near-dup Jaccard>=0.5 edge stage (seventh consumer of
    the session's candidate-graph cache)."""
    return triangle_counts(_registry_edges(spark, sf_dir).select("id_a", "id_b"))


#: k for the near-dup graph core (2-core = strip pendant chains and
#: isolated edges until only cyclically-connected structure remains).
K_CORE_K = 2

#: Measured peel-round counts of the registry 2-core per dataset —
#: constants OF THE DATA (like the k-means trajectory length), pinned
#: so the unrolled SQL oracle renders the matching number of peels.
#: Measure once per new SF (functions.dedup.k_core reports it) and
#: fail loud on unknown SFs.
K_CORE_ROUNDS: dict[str, int] = {"sf0.001": 1, "sf0.01": 1, "sf0.1": 1}


def kcore_rounds_for(sf_dir: str) -> int:
    """Peel-round count for the registry 2-core at this dataset —
    KeyError on unmeasured SFs (measure via docs_kcore_neardup)."""
    return K_CORE_ROUNDS[os.path.basename(os.path.normpath(sf_dir))]


def k_core(edges: DataFrame, k: int = K_CORE_K, max_rounds: int = 50) -> DataFrame:
    """The k-core of an undirected edge list (id_a, id_b): repeatedly
    peel every node of degree < k (all at once, one round) until none
    remains. On the near-dup graph the 2-core separates *cyclically
    reinforced* duplicate neighborhoods (template families, mirror
    farms — structure that survives pruning) from pendant chains whose
    "duplicate" relation hangs off a single edge and disappears once
    its anchor is reviewed — a sharper keep/inspect split than raw
    degree.

    Scale: each round is one degree aggregation + one join-free
    filter via two anti-joins against the (small) low-degree set; the
    peeled set shrinks monotonically and round count is O(peel depth),
    bounded by ``max_rounds``. The edge set is localCheckpoint'd per
    round so lineage stays constant-depth.

    Determinism: the k-core is a unique fixpoint, independent of peel
    or partition order; simultaneous peeling also makes the ROUND
    COUNT a constant of the graph, so the output's ``rounds`` column
    is hash-checkable against an unrolled SQL oracle (the
    kmeans_converged technique).

    Returns (doc_id, degree, rounds): nodes of the k-core with their
    within-core degree and the number of peel rounds performed.
    """
    alive = (
        edges.select(
            F.least("id_a", "id_b").alias("u"),
            F.greatest("id_a", "id_b").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    rounds = 0
    for _ in range(max_rounds):
        sym = alive.union(
            alive.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("c"))
        low = deg.filter(F.col("c") < k).select("u")
        if low.isEmpty():
            break
        alive = (
            alive.join(low, "u", "left_anti")
            .join(low.withColumnRenamed("u", "v"), "v", "left_anti")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        rounds += 1
    sym = alive.union(
        alive.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    return (
        sym.groupBy("u")
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(
            F.col("u").alias("doc_id"),
            "degree",
            F.lit(rounds).cast("int").alias("rounds"),
        )
    )


def docs_kcore_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: 2-core of the shared near-dup Jaccard>=0.5 edge
    stage (eighth consumer of the session's candidate-graph cache)."""
    return k_core(_registry_edges(spark, sf_dir).select("id_a", "id_b"))


def source_overlap_matrix(docs: DataFrame, edges: DataFrame) -> DataFrame:
    """Cross-source duplicate-overlap matrix: near-dup pairs rolled up
    by the (unordered) source pair they straddle — the "which corpora
    duplicate each other" audit that decides whether two crawls can be
    mixed at full weight or one is largely a re-crawl of the other.
    Diagonal cells (src_lo = src_hi) measure within-source redundancy.

    Scale: two dimension joins (documents projected to (doc_id,
    source) — broadcast-able per-source metadata at any scale since
    the edge list already bounds the rows), then a |sources|^2-bounded
    rollup. n_docs uses the two-level distinct (union + distinct +
    count) — no Expand.
    """
    d = docs.select("doc_id", "source")
    pairs = (
        edges.select("id_a", "id_b")
        .join(
            d.select(
                F.col("doc_id").alias("id_a"), F.col("source").alias("src_a")
            ),
            "id_a",
        )
        .join(
            d.select(
                F.col("doc_id").alias("id_b"), F.col("source").alias("src_b")
            ),
            "id_b",
        )
        .select(
            F.least("src_a", "src_b").alias("src_lo"),
            F.greatest("src_a", "src_b").alias("src_hi"),
            "id_a",
            "id_b",
        )
    )
    n_pairs = pairs.groupBy("src_lo", "src_hi").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    ids = (
        pairs.select("src_lo", "src_hi", F.col("id_a").alias("id"))
        .union(pairs.select("src_lo", "src_hi", F.col("id_b").alias("id")))
        .distinct()
    )
    n_docs = ids.groupBy("src_lo", "src_hi").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return n_pairs.join(n_docs, ["src_lo", "src_hi"])


def dedup_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: cross-source overlap matrix over the shared
    near-dup Jaccard>=0.5 edge stage (ninth consumer of the session's
    candidate-graph cache)."""
    return source_overlap_matrix(
        load_table(spark, sf_dir, "documents"),
        _registry_edges(spark, sf_dir).select("id_a", "id_b"),
    )


#: A pair is directional ("one doc contains the other") when the
#: smaller side's shingles are >= this fraction covered.
CONTAINMENT_THRESHOLD = 0.8


def containment_pairs(
    df: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric containment for candidate pairs: C(A,B) = |A∩B|/|A|
    and C(B,A) = |A∩B|/|B| over word shingles. Symmetric Jaccard
    misses the quote-inclusion case — a short doc fully embedded in a
    long one scores low Jaccard but containment ~1.0 from the short
    side. The ``direction`` verdict ('a_in_b' / 'b_in_a' / 'mutual' /
    'partial' at the 0.8 bar) is the survivorship signal: for an
    embedded duplicate you keep the superset document, not the min-id.

    Scale: identical join graph to :func:`ngram_jaccard_pairs` —
    shingle table checkpointed once, joins run only on LSH candidates,
    never all pairs.
    """
    sh = (
        shingles
        if shingles is not None
        else shingle_table(df, id_col, text_col).localCheckpoint(eager=True)
    )
    if pairs is None:
        pairs = lsh_candidate_pairs(df, id_col, text_col, shingles=sh)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.alias("sa")
    b = sh.alias("sb")
    common = (
        pairs.alias("p")
        .join(a, F.col("p.id_a") == F.col(f"sa.{id_col}"))
        .join(
            b,
            (F.col("p.id_b") == F.col(f"sb.{id_col}"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("p.id_a", "p.id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = F.round(F.col("n_common") / F.col("za.sz"), 6)
    cb = F.round(F.col("n_common") / F.col("zb.sz"), 6)
    t = F.lit(CONTAINMENT_THRESHOLD)
    return (
        common.join(sizes.alias("za"), F.col("id_a") == F.col(f"za.{id_col}"))
        .join(sizes.alias("zb"), F.col("id_b") == F.col(f"zb.{id_col}"))
        .select(
            "id_a",
            "id_b",
            "n_common",
            F.col("za.sz").alias("sz_a"),
            F.col("zb.sz").alias("sz_b"),
            ca.alias("containment_a"),
            cb.alias("containment_b"),
            F.when((ca >= t) & (cb >= t), F.lit("mutual"))
            .when(ca >= t, F.lit("a_in_b"))
            .when(cb >= t, F.lit("b_in_a"))
            .otherwise(F.lit("partial"))
            .alias("direction"),
        )
    )


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: asymmetric shingle containment + direction
    verdict for the shared LSH candidate stage (tenth consumer of the
    session's candidate-graph cache)."""
    d = load_table(spark, sf_dir, "documents")
    return containment_pairs(
        d,
        pairs=_registry_candidates(spark, sf_dir),
        shingles=_registry_shingles(spark, sf_dir),
    )


# ---------------------------------------------------------------------------
# BFS hop distance from each cluster's canonical document
# ---------------------------------------------------------------------------

#: Hop cap for the BFS query — a structural bound, not a tuning knob:
#: near-dup components are short edit/paraphrase chains (measured
#: diameter <= 3 on the testdata), and the engine stops EARLY on an
#: empty frontier, so the cap only matters for adversarial long-chain
#: graphs, where it bounds the round count exactly like
#: ``connected_components``' diameter budget.
BFS_MAX_HOPS = 12


def bfs_hops_from_roots(
    edges: DataFrame,
    roots: DataFrame,
    max_hops: int = BFS_MAX_HOPS,
) -> DataFrame:
    """Multi-source breadth-first search over an undirected edge list:
    hop distance from the nearest root, as (node, hops) with hops 0
    for the roots themselves. Sources are all roots at once — for
    disjoint components (one root each) this is per-component BFS in
    a single pass.

    The iterative-join BFS: each round joins the FRONTIER (newly
    reached nodes only, never the whole visited set) against the edge
    list, anti-joins out already-visited nodes, and stops on an empty
    frontier or the hop cap. Each round's frontier is eagerly
    ``localCheckpoint``-ed so lineage stays one round deep — same
    iterative discipline as :func:`connected_components` and pagerank.

    Scale: per-round cost is |frontier| × avg-degree join work, keyed
    on node id (shuffle on the join key); total work is O(|E|) across
    all rounds — every edge relaxes at most twice. The visited set
    grows to |V(components)| rows of (node, hops) — two longs."""
    sym = (
        edges.select(F.col(edges.columns[0]).alias("u"),
                     F.col(edges.columns[1]).alias("v"))
        .union(
            edges.select(F.col(edges.columns[1]).alias("u"),
                         F.col(edges.columns[0]).alias("v"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = (
        roots.select(F.col(roots.columns[0]).alias("node"))
        .distinct()
        .select("node", F.lit(0).alias("hops"))
        .localCheckpoint(eager=True)
    )
    # Only FRONTIERS are materialized (each exactly once); the visited
    # set is a lazy union over the already-checkpointed frontiers, so
    # total checkpoint volume is O(|V|) — re-materializing the growing
    # visited set per round would copy hop-1 nodes ~depth times.
    visited = frontier
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(sym, frontier["node"] == sym["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .select("node", F.lit(h).alias("hops"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.union(nxt)
        frontier = nxt
    return visited


def docs_neardup_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: hop distance from each near-dup cluster's
    CANONICAL document (the component's min doc_id — the survivor the
    canonical-corpus pass keeps) to every document in the cluster —
    "how far from the kept copy is this duplicate", the per-doc
    provenance depth of a dedup decision. Reuses the session-cached
    candidate-graph stages (shingles → LSH → Jaccard edges →
    components), so the incremental cost is the BFS rounds only."""
    edges = _registry_edges(spark, sf_dir).select("id_a", "id_b")
    cc = _registry_components(spark, sf_dir)
    roots = cc.select(F.col("component").alias("node")).distinct()
    d = bfs_hops_from_roots(edges, roots)
    return d.select(F.col("node").alias("doc_id"), "hops")


# ---------------------------------------------------------------------------
# MinHash Jaccard ESTIMATION audit (estimate vs exact, in-plan envelope)
# ---------------------------------------------------------------------------

#: Signature length for the ESTIMATOR entry — independent of the
#: 12-hash LSH banding signature: estimation error is ~0.5/sqrt(k), so
#: the candidate-generation length (tuned for banding recall) is too
#: coarse to audit against; 64 components give sigma <= 0.0625.
MINHASH_EST_HASHES = 64
#: Audit envelope: 4 sigma at k=64. Deterministic (seeded digests), so
#: the oracle pins within_bound TRUE — an estimator regression goes
#: red rather than both sides agreeing on a bad number.
MINHASH_EST_BOUND = 0.25


def dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: the MinHash Jaccard ESTIMATE itself — the
    fraction of agreeing signature components over k=64 seeded hashes
    per LSH candidate pair — audited in-plan against the exact shingle
    Jaccard (|est − exact| ≤ 4σ), completing the sketch story for the
    dedup family: candidates (banding), verification (exact), and now
    the estimator a 100 TB pipeline would SHIP instead of the exact
    join (signatures are fixed-size; the exact verify re-joins the
    shingle table).

    Scale: signatures are one pass over the cached shingle stage; the
    estimate join touches candidates only. Everything is deterministic
    (seeded md5 digests), so the estimate VALUE hash-matches the
    oracle's identical construction — the approximate path is exactly
    checked, the sketch-entry pattern."""
    from operator import add

    d = load_table(spark, sf_dir, "documents")
    sh = _registry_shingles(spark, sf_dir)
    cand = _registry_candidates(spark, sf_dir)
    # the shared 64-hash signature stage — the same frame whose first
    # 12 columns built the candidates; no per-entry signature rebuild
    sigs = _registry_minhash_sigs(spark, sf_dir)
    matches = reduce(
        add,
        [
            (F.col(f"A.mh{i}") == F.col(f"B.mh{i}")).cast("int")
            for i in range(MINHASH_EST_HASHES)
        ],
    )
    est = (
        cand.join(sigs.alias("A"), cand.id_a == F.col("A.doc_id"))
        .join(sigs.alias("B"), cand.id_b == F.col("B.doc_id"))
        .select(
            "id_a",
            "id_b",
            F.round(matches / F.lit(MINHASH_EST_HASHES), 6).alias(
                "est_jaccard"
            ),
        )
    )
    exact = ngram_jaccard_pairs(d, pairs=cand, threshold=0.0, shingles=sh)
    # LEFT join + coalesce: a candidate pair with ZERO common shingles
    # has no row in the common-shingle spine (exact jaccard 0) — it is
    # exactly the pair where a broken estimator would be most wrong,
    # so it must stay IN the audit, not silently drop out of it
    joined = est.join(exact, ["id_a", "id_b"], "left").withColumn(
        "jaccard", F.coalesce(F.col("jaccard"), F.lit(0.0))
    )
    abs_err = F.round(
        F.abs(F.col("est_jaccard") - F.col("jaccard")), 6
    )
    return joined.select(
        "id_a",
        "id_b",
        "est_jaccard",
        "jaccard",
        abs_err.alias("abs_err"),
        (abs_err <= F.lit(MINHASH_EST_BOUND)).alias("within_bound"),
    )
