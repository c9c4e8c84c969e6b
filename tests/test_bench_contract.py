"""bench.py contract: its name lists must track the live registry —
stale names silently skip warmups (re-charging first-touch costs to
unlucky queries) or drop headline entries from the driver-visible
line."""

from __future__ import annotations

import bench
from inf2106_map_reduce_spark.queries import REGISTRY


def test_warmup_names_exist():
    missing = [n for n in bench.WARMUP if n not in REGISTRY]
    assert not missing, missing


def test_headline_names_exist():
    known = set(REGISTRY) | set(bench.PSEUDO_STAGES)
    missing = [n for n in bench.HEADLINE if n not in known]
    assert not missing, missing


def test_stage_build_is_timed_and_consumers_exist():
    # the pseudo-line only makes sense while the six stage-cache
    # consumers are registry entries; if they're renamed, re-audit the
    # attribution story
    assert "dedup_stage_build" in bench.HEADLINE
    for consumer in (
        "dedup_minhash_candidates",
        "dedup_ngram_jaccard",
        "dedup_clusters",
        "dedup_clusters_star",
        "dedup_canonical_corpus",
        "docs_pagerank_neardup",
    ):
        assert consumer in REGISTRY, consumer


def test_all_streaming_queries_are_warmed():
    # each Structured Streaming plan pays its own first-touch cost; a
    # streaming entry missing from WARMUP gets billed ~1-2 s of setup
    streaming = {n for n in REGISTRY if n.startswith("streaming_")}
    assert streaming <= set(bench.WARMUP)
