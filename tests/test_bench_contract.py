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
    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, missing


def test_all_streaming_queries_are_warmed():
    # each Structured Streaming plan pays its own first-touch cost; a
    # streaming entry missing from WARMUP gets billed ~1-2 s of setup
    streaming = {n for n in REGISTRY if n.startswith("streaming_")}
    assert streaming <= set(bench.WARMUP)
