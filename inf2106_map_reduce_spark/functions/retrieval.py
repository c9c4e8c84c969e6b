"""Corpus retrieval operators over ``documents`` / ``embeddings``:
BM25 lexical scoring and reciprocal-rank-fusion hybrid search — the
query side of a training-data / RAG pipeline (the reference's
map-reduce word-count is the degenerate form: tf without the ranking
model; see mapreduce/src/MapServant.java for the reference tokenizer
contract this module's normalization mirrors).

Scale stance (100 TB):
- Tokenization + tf are one explode/agg pass; the query-term filter is
  applied BEFORE the (doc, term) aggregate so the shuffled tf table is
  |matching docs| x |query terms|, not corpus-sized.
- Corpus statistics (N, avgdl, per-term df) are scalar / |terms|-row
  aggregates broadcast back — no driver-side state.
- Top-k uses orderBy().limit(k) (Spark plans TakeOrderedAndProject:
  per-partition heaps + a k-row driver merge), never a global window;
  the row_number that materializes ranks runs on the k-row result
  only, where a single partition is bounded by construction.

Determinism contract (hash-parity with the DuckDB oracles): every
floating term is rounded to 9 decimals before any cross-term sum, sums
fold in a sorted sequential order, rankings are total orders with id
tie-breaks, and final scores round to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from inf2106_map_reduce_spark.functions import vector as vector_fns
from inf2106_map_reduce_spark.tables import load_table

# The fixed audit query: three corpus terms spanning the df range so
# idf actually differentiates (picked from the synthetic vocabulary).
DEFAULT_QUERY_TERMS: tuple[str, ...] = ("spark", "customer", "vector")
BM25_K1 = 1.2
BM25_B = 0.75
RRF_K = 60
HYBRID_TOPK = 50
HYBRID_QUERY_VEC_ID = 0


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One (id, word) row per token, the shared normalization used by
    every text operator (lower/trim/whitespace-split, empties out)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(
        F.col(id_col), F.explode(F.split(norm, " ")).alias("word")
    ).filter(F.col("word") != "")


def bm25_scores(
    df: DataFrame,
    query_terms: tuple[str, ...] = DEFAULT_QUERY_TERMS,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 score of every matching document for a fixed term query.

    Uses the Lucene/ATIRE idf ``ln((N - df + 0.5)/(df + 0.5) + 1)``
    (always positive) with the standard saturation/length terms. N and
    avgdl are defined over documents with >= 1 token (the ``dl`` table)
    so both engines agree on the denominator population.

    Plan: one tokenize pass feeds (a) per-doc lengths and (b) the
    term-filtered tf table; df-per-term and the (N, avgdl) scalar are
    tiny aggregates broadcast into the scoring select; the only
    corpus-sized shuffle is the per-doc length aggregate.
    """
    w = _tokens(df, id_col, text_col)
    dl = w.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        w.filter(F.col("word").isin(*query_terms))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfs = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    denom = F.col("tf") + k1 * (
        1 - b + b * F.col("dl") / F.col("avgdl")
    )
    terms = (
        tf.join(F.broadcast(dfs), "word")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            "word",
            F.round(idf * F.col("tf") * (k1 + 1) / denom, 9).alias("term"),
        )
    )
    return terms.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_terms_matched"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("word", "term"))),
                F.lit(0.0),
                lambda acc, s: acc + s["term"],
            ),
            6,
        ).alias("bm25"),
    )


def bm25_topk(
    df: DataFrame,
    query_terms: tuple[str, ...] = DEFAULT_QUERY_TERMS,
    k: int = HYBRID_TOPK,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k BM25 ranking: exact top-k by (bm25 desc, id asc) via
    TakeOrderedAndProject, then ranks materialized on the k-row result
    (single partition bounded by k, not by data size)."""
    scores = bm25_scores(df, query_terms, id_col=id_col)
    top = scores.orderBy(F.desc("bm25"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("bm25"), F.asc(id_col))
    return top.withColumn("bm_rank", F.row_number().over(w))


def hybrid_rrf(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: tuple[str, ...] = DEFAULT_QUERY_TERMS,
    query_vec_id: int = HYBRID_QUERY_VEC_ID,
    k: int = HYBRID_TOPK,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """Reciprocal-rank-fusion hybrid retrieval: fuse the BM25 lexical
    top-k with the exact-cosine dense top-k (query = the stored vector
    of ``query_vec_id``, itself excluded) as
    ``sum(1 / (rrf_k + rank))`` over the lists a doc appears in.

    Scale: both lists are k-row results of distributed top-k; the
    fusion is a k-vs-k outer join on the driver-free path. The dense
    side reuses :func:`vector.brute_force_topk` (broadcast query,
    single scan) — swap in the LSH/IVF top-k for corpus-scale query
    loads; fusion is rank-only so the substitution is plan-local.
    """
    bm = bm25_topk(docs, query_terms, k=k).select(
        F.col("doc_id"), F.col("bm25"), F.col("bm_rank")
    )
    dense = vector_fns.brute_force_topk(
        embeddings, query_ids=(query_vec_id,), k=k
    ).select(
        F.col("vec_id").alias("doc_id"),
        F.col("cos_sim"),
        F.col("rank").alias("cos_rank"),
    )
    fused = bm.join(dense, "doc_id", "full_outer")
    contrib = lambda r: F.coalesce(  # noqa: E731
        F.round(1.0 / (rrf_k + F.col(r)), 9), F.lit(0.0)
    )
    return fused.select(
        "doc_id",
        "bm_rank",
        "cos_rank",
        F.round(contrib("bm_rank") + contrib("cos_rank"), 9).alias("rrf_score"),
    )


# ---------------------------------------------------------------------------
# Registry entry points
# ---------------------------------------------------------------------------


def docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: BM25 top-50 for the fixed 3-term audit query."""
    return bm25_topk(load_table(spark, sf_dir, "documents"))


def docs_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: BM25 + exact-cosine RRF fusion (k=50)."""
    return hybrid_rrf(
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
    )
