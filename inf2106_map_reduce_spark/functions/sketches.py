"""Approximate (sketch-based) aggregates: HyperLogLog++ distinct
counting and quantile sketches.

At 100 TB these are often the only viable form of their exact
counterparts: exact COUNT(DISTINCT) shuffles every distinct value,
HLL++ merges fixed ~KB sketches (one narrow pass + tiny combine);
exact percentiles sort, the quantile sketch streams. Accuracy is a
knob (``rsd`` / ``accuracy``), checked by tolerance tests against the
exact answers (tests/test_sketches.py) — sketch outputs can't
hash-match an exact SQL oracle by construction, so the registry
entries take the weaker rows-only check and the tolerance tests carry
the correctness weight.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inf2106_map_reduce_spark.tables import load_table


def approx_distinct(
    df: DataFrame, value_col: str, group_cols: list[str], rsd: float = 0.02
) -> DataFrame:
    """HLL++ approximate distinct count per group (relative standard
    deviation ``rsd``; sketch size grows as 1/rsd²)."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias(f"approx_distinct_{value_col}")
    )


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    probabilities: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    accuracy: int = 10000,
) -> DataFrame:
    """Approximate percentiles per group (Greenwald-Khanna style
    sketch; error ≤ 1/accuracy of the rank)."""
    probs = "array(" + ", ".join(str(p) for p in probabilities) + ")"
    agg = df.groupBy(*group_cols).agg(
        F.expr(
            f"approx_percentile({value_col}, {probs}, {accuracy})"
        ).alias("approx_quantiles")
    )
    # Flatten the array into one scalar column per probability: sketch
    # state stays an array through the merge (cheap), but the OUTPUT
    # must be scalar — array cells are unhashable downstream (pandas
    # canonicalizers, BI tools) and carry no extra information here.
    return agg.select(
        *group_cols,
        *[
            # round() not int(): float representation makes int(0.35*100)
            # truncate to 34 — defaults happen to be exact, overrides not.
            F.col("approx_quantiles")[i].alias(f"q{int(round(p * 100))}")
            for i, p in enumerate(probabilities)
        ],
    )


def sketch_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query (hash-checkable): MERGEABLE sketch rollup — the
    hypertable pattern that makes distinct-counting tractable at
    100 TB. Fine-grain HLL sketches (distinct customers per
    (status, order month), DataSketches ``hll_sketch_agg`` binary
    columns) are built once, then UNIONED to the coarser status grain
    (``hll_union_agg``) — re-aggregation touches only sketch bytes,
    never the raw data. In production the monthly sketches are stored
    (one binary column in the rollup table); every coarser rollup
    (quarter/year/all-time, any status combination) derives by union
    without rescanning orders.

    Output hash-matches an exact oracle the same way
    :func:`sketch_orders_per_status` does: exact keys and counts plus
    in-plan booleans certifying the merged estimate against a 5-sigma
    envelope of the exact distinct (DataSketches HLL at default
    lgConfigK=12 has rsd ~1.6%; the envelope uses 10%).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_custkey", F.date_trunc("month", "o_orderdate").alias("mon")
    )
    monthly = o.groupBy("o_orderstatus", "mon").agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    merged = monthly.groupBy("o_orderstatus").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est"),
        F.sum("n_orders").alias("n_orders"),
        F.count(F.lit(1)).alias("n_months"),
    )
    exact = (
        o.groupBy("o_orderstatus", "o_custkey")
        .agg(F.lit(1).alias("_one"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_distinct_cust"))
    )
    return merged.join(exact, "o_orderstatus").select(
        "o_orderstatus",
        "n_orders",
        "n_months",
        "n_distinct_cust",
        (
            F.abs(F.col("_est") - F.col("n_distinct_cust"))
            <= F.lit(DISTINCT_REL_BOUND) * F.col("n_distinct_cust")
        ).alias("merged_within_bound"),
    )


#: Misra-Gries summary capacity: every item with true frequency
#: > n/(MG_CAPACITY+1) is GUARANTEED to survive the sketch, and every
#: estimate sits in [true - n/(MG_CAPACITY+1), true] — both theorems
#: hold for the MERGED summary too (per-partition errors sum to at
#: most n/(m+1) across disjoint partitions), which is what makes the
#: audit booleans below deterministically TRUE regardless of how Spark
#: partitions the tokens.
MG_CAPACITY = 100


def misra_gries_partition_summaries(
    items: DataFrame, item_col: str = "item", m: int = MG_CAPACITY
) -> DataFrame:
    """Per-partition Misra-Gries frequency summaries (≤ ``m`` counters
    each): the bounded-memory heavy-hitters sketch (Misra & Gries 1982;
    the `frequent items` summary in DataSketches). Streams each
    partition once through a dict of at most ``m`` counters — the
    decrement-all step amortizes to O(1) per item — so executor memory
    is O(m) no matter how many distinct items the partition holds;
    that bound, not speed, is why a 100 TB vocabulary scan uses this
    instead of an exact groupBy (whose shuffle carries every distinct
    item). I/O is Arrow-batched (``mapInPandas``); the per-item dict
    update IS the sketch contract, not an accidental Python loop.

    Output (item, est) rows per partition; merge by summing ``est``
    per item (:func:`heavy_hitters_audit`) — estimates stay
    lower-bounds with total error ≤ n/(m+1)."""

    def mg(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in it:
            for w in pdf[item_col]:
                if w in counters:
                    counters[w] += 1
                elif len(counters) < m:
                    counters[w] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {"item": list(counters), "est": list(counters.values())}
        )

    return items.select(F.col(item_col).alias(item_col)).mapInPandas(
        mg, schema="item string, est long"
    )


def heavy_hitters_audit(
    items: DataFrame,
    item_col: str = "item",
    m: int = MG_CAPACITY,
    top_k: int = 20,
) -> DataFrame:
    """Hash-checkable heavy-hitters query: exact top-``top_k`` items
    (deterministic: count DESC, item ASC) plus in-plan booleans
    auditing the merged Misra-Gries sketch against its two theorems —
    the same envelope pattern as the HLL/quantile audits, applied to a
    sketch whose raw candidate set is PARTITIONING-DEPENDENT (which
    low-count stragglers survive depends on item order, so the sketch
    itself can never hash-match; the theorems hold for any order, so
    verdicts about it can):

    - ``in_sketch_ok``: TRUE unless the item's exact count clears the
      guarantee threshold n/(m+1) AND the sketch missed it;
    - ``est_within_bound``: TRUE unless the sketch holds the item with
      an estimate outside [exact - n/(m+1), exact].

    Scale: sketch pass is one narrow O(m)-memory scan + a tiny merge
    (≤ m rows per partition); the exact pass exists to AUDIT it and is
    what the sketch replaces at 100 TB.
    """
    src = items.select(F.col(item_col).alias("item"))
    merged = (
        misra_gries_partition_summaries(src, "item", m=m)
        .groupBy("item")
        .agg(F.sum("est").alias("est"))
    )
    exact = src.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    total = src.agg(F.count(F.lit(1)).alias("_total"))
    top = (
        exact.orderBy(F.desc("n"), F.asc("item"))
        .limit(top_k)
        .crossJoin(F.broadcast(total))  # single-row scalar pairing
        .join(merged, "item", "left")
    )
    thresh = F.col("_total") / F.lit(m + 1)
    return top.select(
        F.col("item").alias("word"),
        "n",
        (
            (F.col("n") <= thresh) | F.col("est").isNotNull()
        ).alias("in_sketch_ok"),
        (
            F.col("est").isNull()
            | (
                (F.col("est") <= F.col("n"))
                & (F.col("est") >= F.col("n") - thresh)
            )
        ).alias("est_within_bound"),
    )


def sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: top-20 document words, exact counts +
    Misra-Gries sketch audit verdicts."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split("text", r"\s+")).alias("item")
    ).filter(F.col("item") != "")
    return heavy_hitters_audit(words, "item")


#: Rank-error envelope for the quantile audit. approx_percentile at
#: accuracy=10000 guarantees rank error <= 1e-4 of N; auditing at 1e-2
#: is a 100x safety margin, so the booleans are deterministically TRUE
#: for any input the sketch contract covers — which is what lets an
#: exact SQL oracle (TRUE literals) hash-match a sketch query.
QUANTILE_RANK_DELTA = 0.01
#: Relative-error envelope for the HLL++ audit: rsd=0.02 means sigma =
#: 2% of the true cardinality; 10% is a 5-sigma envelope.
DISTINCT_REL_BOUND = 0.10

_QUANTILE_PROBS = (0.25, 0.5, 0.75, 0.95)


def sketch_orders_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query (hash-checkable): per ``o_orderstatus``, exact
    COUNT(*) and COUNT(DISTINCT o_custkey) plus in-plan audit booleans
    that certify the HLL++ distinct estimate and each approx_percentile
    value sit inside their declared error envelopes.

    Sketch VALUES can't hash-match an exact oracle by construction, so
    the output carries exact keys/counts and *verdicts about* the
    sketches instead: ``distinct_within_bound`` compares the HLL++
    estimate to the exact cardinality (5-sigma envelope), and each
    ``qNN_within_bound`` rank-checks the sketch's returned value
    against the raw data — cnt(x <= v) must reach rank (p - delta)*N
    and cnt(x < v) must not pass (p + delta)*N, delta = 100x the
    sketch's guarantee. The DuckDB oracle computes the same exact
    values and TRUE literals, so rows+schema+hash all match while the
    sketches still actually run (and fail the query if they ever break
    their contract). Tolerance tests on the raw estimates stay in
    tests/test_sketches.py.

    Scale: three aggregation passes over orders, each Expand-free —
    the estimate pass (approx_percentile), the rank-audit pass
    (broadcast 3-row sketch values back onto the scan, plain
    conditional sums), and a TWO-LEVEL distinct pass (pre-distinct on
    (status, custkey), then count + HLL over the distinct rows — the
    classic rewrite that avoids COUNT(DISTINCT)'s Expand, which would
    double every scanned row when mixed with other aggregates; HLL
    over pre-distinct rows estimates the same cardinality). Measured
    2× faster than the single mixed agg at sf0.1 (0.7 s vs 1.5 s
    warm). At 100 TB the audit passes are the price of certification;
    drop them and the sketch pass alone remains the production path
    (:func:`approx_distinct` / :func:`approx_quantiles`).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_custkey", "o_totalprice"
    )
    probs_sql = "array(" + ", ".join(str(p) for p in _QUANTILE_PROBS) + ")"
    aq = o.groupBy("o_orderstatus").agg(
        F.expr(f"approx_percentile(o_totalprice, {probs_sql}, 10000)").alias("_aq")
    )
    rank_audit = (
        o.join(F.broadcast(aq), "o_orderstatus")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            *[
                F.sum((F.col("o_totalprice") <= F.col("_aq")[i]).cast("long")).alias(
                    f"_le{i}"
                )
                for i in range(len(_QUANTILE_PROBS))
            ],
            *[
                F.sum((F.col("o_totalprice") < F.col("_aq")[i]).cast("long")).alias(
                    f"_lt{i}"
                )
                for i in range(len(_QUANTILE_PROBS))
            ],
        )
    )
    distinct_audit = (
        o.groupBy("o_orderstatus", "o_custkey")
        .agg(F.lit(1).alias("_one"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_cust"),
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("_ad"),
        )
    )
    audited = rank_audit.join(distinct_audit, "o_orderstatus")
    return audited.select(
        "o_orderstatus",
        "n_orders",
        "n_distinct_cust",
        (
            F.abs(F.col("_ad") - F.col("n_distinct_cust"))
            <= F.lit(DISTINCT_REL_BOUND) * F.col("n_distinct_cust")
        ).alias("distinct_within_bound"),
        *[
            (
                (F.col(f"_le{i}") >= (F.lit(p - QUANTILE_RANK_DELTA)) * F.col("n_orders"))
                & (F.col(f"_lt{i}") <= (F.lit(p + QUANTILE_RANK_DELTA)) * F.col("n_orders"))
            ).alias(f"q{int(round(p * 100))}_within_bound")
            for i, p in enumerate(_QUANTILE_PROBS)
        ],
    )


#: Bloom filter geometry: m bits, k hash functions. 32 K bits audits
#: ~10 K inserted keys at sf0.1 at a realistic ~45% fill; production
#: sizes m from the inserted-key estimate (m ≈ -n·ln(fp)/ln(2)²).
BLOOM_BITS = 1 << 15
BLOOM_HASHES = 3


def bloom_positions(key: Column) -> Column:
    """Array of ``BLOOM_HASHES`` bit positions for a key: seeded md5,
    first 8 hex chars as an integer, mod ``BLOOM_BITS`` — the same
    engine-neutral hash family as the MinHash signatures, so every
    position is exactly reproducible in SQL."""
    return F.array(
        *[
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{s}:"), key)), 1, 8), 16, 10
            ).cast("bigint")
            % BLOOM_BITS
            for s in range(BLOOM_HASHES)
        ]
    )


def bloom_membership_audit(
    build: DataFrame,
    probe: DataFrame,
    build_col: str,
    probe_col: str,
) -> DataFrame:
    """Build a Bloom filter over ``build``'s keys, probe it with
    ``probe``'s keys, and certify it against exact membership — the
    "have we already ingested this document/key?" primitive that at
    100 TB replaces an anti-join against the full history with a
    kilobyte-scale bitmap test.

    The filter is represented as the DISTINCT set of set bit
    positions — MERGEABLE by construction: per-partition (or per-day,
    per-shard) position sets union into the corpus filter by plain
    bitwise OR / set union, no rescan. Probing broadcasts the position
    set (<= m rows, ~256 KB at m=2^15) and marks a key present iff
    ALL k of its positions are set.

    Output is one audited row, exact-oracle-checkable: exact member /
    non-member counts, the measured false-positive count/rate, a
    ``no_false_negatives`` verdict (a Bloom filter's hard guarantee —
    this failing means the operator is broken, and the query fails),
    and ``fp_within_bound`` comparing the measured FP rate to
    3 × fill^k + 0.2% — fill^k is the exact expected FP probability
    given the realized fill factor.

    Scale: build = one distinct + one explode/distinct over keys;
    probe = one explode + broadcast join + per-key count. Nothing
    quadratic, nothing driver-side.
    """
    # consumed by the position build AND the exact-membership join —
    # materialize so the distinct runs once
    keys = (
        build.select(F.col(build_col).cast("string").alias("k"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    pos = (
        keys.select(F.explode(bloom_positions(F.col("k"))).alias("p"))
        .distinct()
    )
    n_keys = keys.agg(F.count(F.lit(1)).alias("n_keys_inserted"))
    n_bits = pos.agg(F.count(F.lit(1)).alias("n_bits_set"))
    probe_keys = probe.select(F.col(probe_col).cast("string").alias("k")).distinct()
    pp = probe_keys.select(
        "k", F.explode(bloom_positions(F.col("k"))).alias("p")
    )
    hits = (
        pp.join(F.broadcast(pos.withColumn("_hit", F.lit(1))), "p", "left")
        .groupBy("k")
        .agg(F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("h"))
        .withColumn("bloom_pos", F.col("h") == BLOOM_HASHES)
    )
    joined = hits.join(
        keys.withColumn("_m", F.lit(1)), "k", "left"
    )
    agg = joined.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum(F.coalesce(F.col("_m"), F.lit(0))).cast("bigint").alias("n_members"),
        F.sum(F.col("bloom_pos").cast("int")).cast("bigint").alias("n_bloom_positive"),
        F.sum(
            (F.col("bloom_pos") & F.col("_m").isNull()).cast("int")
        ).cast("bigint").alias("n_false_positive"),
        F.sum(
            ((~F.col("bloom_pos")) & F.col("_m").isNotNull()).cast("int")
        ).cast("bigint").alias("_n_false_negative"),
    )
    fill = F.col("n_bits_set") / F.lit(float(BLOOM_BITS))
    # expected FP = fill^k via explicit multiplication (IEEE-exact and
    # engine-identical, unlike library pow)
    expected = F.round(fill * fill * fill, 9)
    return (
        agg.crossJoin(F.broadcast(n_keys))
        .crossJoin(F.broadcast(n_bits))
        .select(
            "n_keys_inserted",
            "n_bits_set",
            "n_probed",
            "n_members",
            "n_bloom_positive",
            "n_false_positive",
            F.round(
                F.col("n_false_positive")
                / F.nullif(F.col("n_probed") - F.col("n_members"), F.lit(0)),
                6,
            ).alias("fp_rate"),
            (F.col("_n_false_negative") == 0).alias("no_false_negatives"),
            (
                F.coalesce(
                    F.col("n_false_positive")
                    / F.nullif(F.col("n_probed") - F.col("n_members"), F.lit(0)),
                    F.lit(0.0),
                )
                <= F.round(F.lit(3.0) * expected + F.lit(0.002), 9)
            ).alias("fp_within_bound"),
        )
    )


def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: Bloom filter built over the custkeys that have
    orders, probed with every customer, audited against the exact
    semi-join membership."""
    return bloom_membership_audit(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        "o_custkey",
        "c_custkey",
    )


#: Equi-width histogram bin for the mergeable-median rollup: $5,000
#: bins in exact integer cents, so bin edges can't drift between
#: engines on float division.
HIST_BIN_CENTS = 500_000


def binned_median_rollup(
    df: DataFrame,
    group_col: str,
    fine_col: Column,
    value_col: str,
    bin_cents: int = HIST_BIN_CENTS,
) -> DataFrame:
    """Mergeable equi-width-histogram median: the quantile analogue of
    the HLL rollup. Fine-grain ``(group, fine)`` bin-count histograms
    are built once (what production stores — one small map column per
    grain cell), then MERGED to the coarser ``group`` grain by summing
    bin counts; the median estimate interpolates inside the merged
    bin that crosses n/2. Re-aggregation to any coarser grain touches
    only O(bins) counters per cell, never the raw data — and unlike a
    value-materializing exact percentile, the merge state is constant
    size, so a 100 TB regroup is a counter add.

    The output certifies the estimate in-plan: exact interpolated
    median per group (the expensive path the sketch replaces) plus a
    ``within_two_bins`` verdict — the estimate sits in the bin
    containing order statistic ceil(n/2), the true median within one
    more bin, so |est - exact| < 2 bin widths always holds; it failing
    means the operator is broken and the query goes red.

    Determinism: bins are exact integer-cents DIV; the interpolation
    ``lo + width * (n/2 - cum_before)/cnt`` is fixed-structure double
    arithmetic rounded to 6 — engine-identical.
    """
    cents = F.expr(
        f"CAST(ROUND({value_col} * 100, 0) AS BIGINT) DIV {bin_cents}"
    ).alias("bin")
    fine = (
        df.select(F.col(group_col), fine_col.alias("fine"), cents)
        .groupBy(group_col, "fine", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    merged = fine.groupBy(group_col, "bin").agg(F.sum("cnt").alias("cnt"))
    w = Window.partitionBy(group_col).orderBy("bin")
    cum = merged.select(
        group_col,
        "bin",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy(group_col)).alias("n"),
        F.count(F.lit(1)).over(Window.partitionBy(group_col)).alias("n_bins"),
    )
    half = F.col("n") / F.lit(2.0)
    med_bin = cum.filter(
        ((F.col("cum") - F.col("cnt")) < half) & (F.col("cum") >= half)
    )
    est = med_bin.select(
        group_col,
        F.col("n").alias("n_rows"),
        F.col("n_bins"),
        F.round(
            (
                F.col("bin") * F.lit(float(bin_cents))
                + F.lit(float(bin_cents))
                * (half - (F.col("cum") - F.col("cnt")))
                / F.col("cnt")
            )
            / F.lit(100.0),
            6,
        ).alias("est_median"),
    )
    exact = df.groupBy(group_col).agg(
        F.round(F.expr(f"percentile({value_col}, 0.5)"), 6).alias("exact_median")
    )
    width_dollars = bin_cents / 100.0
    return est.join(exact, group_col).select(
        group_col,
        "n_rows",
        "n_bins",
        "est_median",
        "exact_median",
        (
            F.abs(F.col("est_median") - F.col("exact_median"))
            <= F.lit(2.0 * width_dollars)
        ).alias("within_two_bins"),
    )


def sketch_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: per-(status, order year) totalprice histograms
    merged to status grain; interpolated median vs the exact
    percentile with a two-bin-width certification."""
    o = load_table(spark, sf_dir, "orders")
    return binned_median_rollup(
        o, "o_orderstatus", F.year("o_orderdate"), "o_totalprice"
    )


#: Inclusion-exclusion overlap envelope: the intersection estimate
#: compounds THREE independent HLL++ errors (|A|, |B|, |A∪B| at
#: rsd=0.02), so its absolute error scales with the UNION size
#: (√3·rsd ≈ 3.5% of |A∪B| per sigma), not the intersection — a small
#: overlap of two big sets is the hard case. 5-sigma ≈ 0.17·|A∪B|.
OVERLAP_REL_BOUND = 0.18


def sketch_distinct_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query (hash-checkable): distinct-customer OVERLAP
    between order-status segments, estimated purely from mergeable
    HLL++ sketches via inclusion-exclusion (|A∩B| ≈ |Â| + |B̂| −
    |Â∪B|) and audited in-plan against the exact overlap — the
    segment-overlap question ("how many buyers do segments share?")
    answered WITHOUT ever joining the segments, which is the only
    affordable form at 100 TB: per-segment sketches are precomputed
    once (mergeable, tiny), and any pairwise overlap is three sketch
    reads.

    Output carries exact per-segment/union/overlap cardinalities plus
    the ``overlap_within_bound`` verdict certifying the sketch
    estimate sits inside its compounded-error envelope
    (:data:`OVERLAP_REL_BOUND` × exact union — inclusion-exclusion
    error scales with the union, not the overlap). The oracle computes
    the same exact values and TRUE, so the sketches run for real and a
    broken estimate turns the round red (the
    ``sketch_orders_per_status`` certification pattern).

    Scale: ONE pre-distinct on (status, custkey) feeds both passes;
    the flag pass is a per-customer pivot (map-side combinable) and
    the sketch pass is a single aggregate emitting all six HLL
    estimates — two passes over key-sized data, zero joins over raw
    orders.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_custkey"
    )
    dd = o.distinct().localCheckpoint(eager=True)
    statuses = ("F", "O", "P")
    # exact overlaps from one per-customer flag pivot
    flags = dd.groupBy("o_custkey").agg(
        *[
            F.max((F.col("o_orderstatus") == s).cast("int")).alias(f"in_{s}")
            for s in statuses
        ]
    )
    exact = flags.agg(
        *[F.sum(f"in_{s}").cast("bigint").alias(f"n_{s}") for s in statuses],
        *[
            F.sum(
                (F.col(f"in_{a}") * F.col(f"in_{b}")).cast("long")
            ).alias(f"n_{a}{b}")
            for a, b in (("F", "O"), ("F", "P"), ("O", "P"))
        ],
        *[
            F.sum(
                F.greatest(F.col(f"in_{a}"), F.col(f"in_{b}")).cast("long")
            ).alias(f"u_{a}{b}")
            for a, b in (("F", "O"), ("F", "P"), ("O", "P"))
        ],
    )
    # sketch estimates: conditional HLLs over the same pre-distinct
    # rows (NULLs are skipped, so when() masks per-segment membership)
    est = dd.agg(
        *[
            F.approx_count_distinct(
                F.when(F.col("o_orderstatus") == s, F.col("o_custkey")),
                rsd=0.02,
            ).alias(f"ad_{s}")
            for s in statuses
        ],
        *[
            F.approx_count_distinct(
                F.when(
                    F.col("o_orderstatus").isin(a, b), F.col("o_custkey")
                ),
                rsd=0.02,
            ).alias(f"ad_u_{a}{b}")
            for a, b in (("F", "O"), ("F", "P"), ("O", "P"))
        ],
    )
    both = exact.crossJoin(est)
    rows = [
        both.select(
            F.lit(a).alias("status_a"),
            F.lit(b).alias("status_b"),
            F.col(f"n_{a}").alias("n_a"),
            F.col(f"n_{b}").alias("n_b"),
            F.col(f"u_{a}{b}").alias("n_union"),
            F.col(f"n_{a}{b}").alias("n_overlap"),
            (
                F.abs(
                    (
                        F.col(f"ad_{a}")
                        + F.col(f"ad_{b}")
                        - F.col(f"ad_u_{a}{b}")
                    )
                    - F.col(f"n_{a}{b}")
                )
                <= F.lit(OVERLAP_REL_BOUND) * F.col(f"u_{a}{b}")
            ).alias("overlap_within_bound"),
        )
        for a, b in (("F", "O"), ("F", "P"), ("O", "P"))
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# Count-min sketch (point-frequency estimation)
# ---------------------------------------------------------------------------

#: Depth (independent hash rows) and width (counters per row). Width
#: is a power of two; the classic guarantee is
#: err <= (e / width) * N with prob 1 - e^-depth per probe — the
#: audit below uses the looser deterministic-to-compute 2N/width line
#: (identically evaluated on both engines; a probe past it is
#: REPORTED, not hidden).
CM_DEPTH = 4
CM_WIDTH = 1 << 10


def cm_buckets(key: Column) -> Column:
    """Array of ``CM_DEPTH`` counter indices for a key: seeded md5,
    first 8 hex chars as an integer, mod ``CM_WIDTH`` — the
    engine-neutral hash family shared with :func:`bloom_positions` /
    the MinHash signatures, under distinct ``cm{d}:`` seeds so the
    families never alias each other."""
    return F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"cm{d}:"), key)), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % CM_WIDTH
            for d in range(CM_DEPTH)
        ]
    )


def countmin_audit(
    build: DataFrame,
    probe: DataFrame,
    build_col: str,
    probe_col: str,
) -> DataFrame:
    """Count-min sketch built over ``build_col`` occurrences, probed
    with every distinct ``probe_col`` key, audited in-plan against the
    exact frequencies — the point-frequency member of the sketch
    family (HLL answers distinct-count, Misra-Gries heavy hitters,
    Bloom membership; CM answers "how often is k?" in O(depth*width)
    mergeable state).

    Scale: the build is one map-side-combined groupBy into at most
    ``depth * width`` cells (the sketch IS the aggregate state — at
    100 TB the counters merge like any partial agg; cells, not rows,
    cross the network). The probe side broadcasts the finished
    sketch — a few KB — so estimation is a narrow pass over the probe
    keys. Keys absent from the build audit pure collision noise
    (est > 0 there is the sketch's one-sided error, visibly
    reported).

    Guarantees checked per probe key: ``est >= exact`` always
    (``overestimate_ok`` — a FALSE anywhere means the operator is
    broken, and the driver hash would go red), and
    ``est - exact <= 2N/width`` (``within_bound``) as the reported
    error envelope.
    """
    keys = build.select(F.col(build_col).cast("string").alias("k"))
    pos = keys.select(
        "k", F.posexplode(cm_buckets(F.col("k"))).alias("d", "b")
    )
    sketch = pos.groupBy("d", "b").agg(F.count(F.lit(1)).alias("cnt"))
    n_total = keys.agg(F.count(F.lit(1)).alias("n"))
    probe_keys = (
        probe.select(F.col(probe_col).cast("string").alias("k")).distinct()
    )
    pp = probe_keys.select(
        "k", F.posexplode(cm_buckets(F.col("k"))).alias("d", "b")
    )
    est = (
        pp.join(F.broadcast(sketch), ["d", "b"], "left")
        .groupBy("k")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("est_cnt")
        )
    )
    exact = keys.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    return (
        est.join(exact, "k", "left")
        .crossJoin(F.broadcast(n_total))
        .select(
            F.col("k").cast("bigint").alias("key"),
            F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("exact_cnt"),
            "est_cnt",
            (F.col("est_cnt") >= F.coalesce(F.col("c"), F.lit(0))).alias(
                "overestimate_ok"
            ),
            (
                (F.col("est_cnt") - F.coalesce(F.col("c"), F.lit(0)))
                <= F.lit(2.0) * F.col("n") / F.lit(CM_WIDTH)
            ).alias("within_bound"),
        )
    )


def sketch_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: count-min sketch of order counts per custkey,
    probed with every customer (including the order-less ones, whose
    nonzero estimates expose raw collision noise)."""
    return countmin_audit(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        "o_custkey",
        "c_custkey",
    )


#: Bin width (integer cents) for the multi-quantile merge sketch:
#: $1,000 bins over l_extendedprice's ~$900-$105,000 range give ~105
#: bins — fine enough that per-bin counts (the rank-error envelope)
#: stay a small fraction of n, coarse enough that the merge state is
#: O(100) counters per source.
QUANTILE_BIN_CENTS = 100_000

#: The certified quantile vector.
SKETCH_QUANTILES = (0.25, 0.5, 0.75, 0.9, 0.99)


def percentile_sketch_merge(
    df: DataFrame,
    source_col: Column,
    value_col: str,
    quantiles: tuple[float, ...] = SKETCH_QUANTILES,
    bin_cents: int = QUANTILE_BIN_CENTS,
) -> DataFrame:
    """Cross-source mergeable percentile sketch with a GK/KLL-style
    RANK-error certification — the merge-mechanics member of the
    sketch family (HLL rollup = distinct, count-min = frequency,
    Misra-Gries = heavy hitters, binned median = one quantile at one
    regroup; this one merges INDEPENDENTLY BUILT per-source sketches
    and certifies a whole quantile vector).

    Each source shard (an ingest batch, here a ship-date year) builds
    its own equi-width histogram — the sketch a pipeline would ship
    instead of raw values. Merging is pure counter addition (the
    defining mergeability property GK/KLL/t-digest engineer for; the
    equi-width histogram has it trivially). From the merged sketch,
    each quantile q is estimated by interpolating inside the bin
    containing target rank ceil(q·n).

    The certification is in GK/KLL's own currency — RANK error, not
    value error: ``actual_rank = COUNT(value <= est)`` must sit within
    the containing bin's count of the target rank (a histogram
    estimate can misplace rank only within its own bin). Unlike a
    value-error audit this needs no exact percentile (no global sort):
    one conditional-count pass against the ≤|quantiles| broadcast
    estimate rows.

    Scale: sketch build is one map-side-combinable groupBy; all
    cumulative work runs on the O(bins) merged frame; the audit is a
    second scan with a 5-row broadcast — the only part a production
    deployment would drop (it exists to make the query
    self-certifying). Determinism: integer bins and counts; the
    interpolation is fixed-structure double arithmetic rounded to 6;
    ceil(q·n) is the identical double op in both engines.
    """
    src = source_col.alias("source")
    bin_ = F.expr(
        f"CAST(ROUND({value_col} * 100, 0) AS BIGINT) DIV {bin_cents}"
    ).alias("bin")
    # one sketch per source shard — what each pipeline ships
    per_source = (
        df.select(src, bin_)
        .groupBy("source", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # THE MERGE: counter addition across sources (the oracle builds
    # the histogram directly off the union, so hash equality proves
    # merge-of-parts == sketch-of-whole)
    merged = per_source.groupBy("bin").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
    w = Window.orderBy("bin")
    cum = merged.select(
        "bin",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).cast("long").alias("n"),
    )
    qf = cum.crossJoin(
        F.broadcast(
            df.sparkSession.range(1).select(
                F.explode(
                    F.array(*[F.lit(q) for q in quantiles])
                ).alias("q")
            )
        )
    ).withColumn(
        "target_rank",
        F.ceil(F.col("q") * F.col("n").cast("double")).cast("long"),
    )
    hit = qf.filter(
        ((F.col("cum") - F.col("cnt")) < F.col("target_rank"))
        & (F.col("cum") >= F.col("target_rank"))
    )
    wc = float(bin_cents)
    est = hit.select(
        "q",
        F.col("n").alias("n_rows"),
        "target_rank",
        F.col("cnt").alias("bin_cnt"),
        F.round(
            (
                F.col("bin") * F.lit(wc)
                + F.lit(wc)
                * (F.col("target_rank") - (F.col("cum") - F.col("cnt")))
                / F.col("cnt")
            )
            / F.lit(100.0),
            6,
        ).alias("est_value"),
    )
    audit = (
        df.select(F.col(value_col).alias("_v"))
        .crossJoin(F.broadcast(est))
        .groupBy("q", "n_rows", "target_rank", "bin_cnt", "est_value")
        .agg(
            F.sum((F.col("_v") <= F.col("est_value")).cast("long")).alias(
                "actual_rank"
            )
        )
    )
    return audit.select(
        "q",
        "n_rows",
        "est_value",
        "target_rank",
        "actual_rank",
        "bin_cnt",
        (
            F.abs(F.col("actual_rank") - F.col("target_rank"))
            <= F.col("bin_cnt")
        ).alias("within_rank_bound"),
    ).orderBy("q")


def sketch_percentile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: per-ship-year extendedprice histograms merged
    into one sketch; 5-point quantile vector certified by rank error."""
    li = load_table(spark, sf_dir, "lineitem")
    return percentile_sketch_merge(
        li, F.year("l_shipdate"), "l_extendedprice"
    )
