"""The driver hash-checks the first ROTATION_WINDOW registry entries
per round; the rotation schedule must guarantee every entry enters
that window within a bounded number of consecutive rounds — making the
cumulative-coverage claim structural rather than curated."""

from __future__ import annotations

import math
import os
import subprocess
import sys

from inf2106_map_reduce_spark import queries as q


def _window(round_no: int) -> set[str]:
    return set(q.rotated_names(round_no)[: q.ROTATION_WINDOW])


def test_full_coverage_within_bounded_rounds():
    n = len(q.REGISTRY)
    horizon = math.ceil(n / q.ROTATION_STRIDE)
    # staleness bound: no entry waits more than 8 rounds for a
    # driver check at the current registry size (r06/r07 verdicts)
    assert horizon <= 8, (n, q.ROTATION_STRIDE, horizon)
    # any consecutive span of `horizon` rounds covers every entry,
    # wherever it starts
    for start in (1, 2, 5, 7, 23):
        seen: set[str] = set()
        for r in range(start, start + horizon):
            seen |= _window(r)
        assert seen == set(q.REGISTRY), (
            f"rounds {start}..{start + horizon - 1} miss "
            f"{sorted(set(q.REGISTRY) - seen)}"
        )


def test_priority_always_front_loaded():
    for r in (1, 5, 9):
        order = q.rotated_names(r)
        assert tuple(order[: len(q._ROUND_PRIORITY)]) == q._ROUND_PRIORITY


def test_rotation_is_permutation_and_deterministic():
    for r in (1, 6):
        order = q.rotated_names(r)
        assert sorted(order) == sorted(q.REGISTRY)
        assert order == q.rotated_names(r)
    # different rounds produce different windows (the rotation moves)
    assert _window(1) != _window(2)


def test_priority_fits_coverage_guarantee():
    assert len(q._ROUND_PRIORITY) <= q.ROTATION_WINDOW - q.ROTATION_STRIDE


def test_registry_order_matches_schedule_via_env():
    # the live module applies the rotation at import; check a pinned
    # round in a subprocess so we don't depend on repo-root artifacts
    code = (
        "from inf2106_map_reduce_spark import queries as q; "
        "names = list(q.REGISTRY); "
        "assert names == q.rotated_names(7, names), 'import-time order != schedule'; "
        "print(len(names))"
    )
    env = dict(os.environ, SPARK_GRAFT_ROUND="7")
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr
    assert int(out.stdout.strip()) == len(q.REGISTRY)


def test_oracle_for_renders_sf_matched_kmeans_unroll():
    # trajectory length is a constant of the DATASET: the local-harness
    # oracle must unroll 13 rounds at sf0.001 vs 19 at sf0.01, and the
    # static driver contract must equal the gate-SF rendering
    o001 = q.oracle_for("kmeans_converged", "/root/testdata/sf0.001")
    o01 = q.oracle_for("kmeans_converged", "/root/testdata/sf0.01")
    assert "AS rounds" in o001 and "AS rounds" in o01
    assert o001 != o01
    assert "13" in o001 and "19" in o01
    assert q.REGISTRY["kmeans_converged"].oracle == o01
    # every other entry passes through unchanged
    assert q.oracle_for("q1_pricing_summary", "/root/testdata/sf0.001") == (
        q.REGISTRY["q1_pricing_summary"].oracle
    )


def test_oracle_for_renders_sf_matched_kcore_unroll():
    # peel-round count is a dataset constant; all measured SFs happen
    # to peel once, so the rendered oracles are identical today — the
    # contract is that rendering goes through the per-SF table and the
    # driver's static oracle equals the gate-SF rendering
    o001 = q.oracle_for("docs_kcore_neardup", "/root/testdata/sf0.001")
    o01 = q.oracle_for("docs_kcore_neardup", "/root/testdata/sf0.01")
    assert "AS rounds" in o001 and "AS rounds" in o01
    assert q.REGISTRY["docs_kcore_neardup"].oracle == o01
    import pytest

    with pytest.raises(KeyError):
        q.oracle_for("docs_kcore_neardup", "/root/testdata/sf9.9")


def test_round8_fill_covered_names_have_hard_driver_rows():
    # In round 8 these two names were dropped from the priority block
    # (horizon cap) on the structural claim that the round-8 FILL
    # segment covered them. The claim is now settled by the hard
    # artifact: CORRECTNESS_r08.json must carry a fully-green row for
    # each. (Recomputing _window(8) would be wrong post-swap — the
    # live _ROUND_PRIORITY is the round-9 block.)
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "CORRECTNESS_r08.json")) as f:
        r08 = json.load(f)
    for name in q._ROUND8_FILL_COVERED:
        row = r08[name]
        assert row["hash_match"] and row["err"] is None, (name, row)


def test_round9_never_checked_names_have_hard_driver_rows():
    # round-9 verdict item #1 is now settled by the hard artifact
    # (post-swap the live _ROUND_PRIORITY is the round-10 block, so
    # recomputing _window(9) would be wrong — the r08 pattern): the 4
    # entries with no CORRECTNESS row in rounds 1-8 led the round-9
    # block and must carry fully-green CORRECTNESS_r09 rows, closing
    # cumulative driver coverage at 100%.
    import json

    never_checked = set(q._ROUND9_DEFERRED) | {"docs_communities_labelprop"}
    assert never_checked <= set(q._ROUND9_PRIORITY[:4])
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "CORRECTNESS_r09.json")) as f:
        r09 = json.load(f)
    for name in never_checked:
        row = r09[name]
        assert row["hash_match"] and row["err"] is None, (name, row)


def test_round10_priority_was_exactly_the_budgeted_block():
    # round-10 budget (ROTATION_STRIDE comment): 2 new entries + the
    # plan-rewritten modularity re-verify — archived as a named record
    # once CORRECTNESS_r10 landed their hard rows (all green)
    assert q._ROUND10_PRIORITY == (
        "streaming_session_timeout",
        "bloom_runtime_join",
        "docs_communities_modularity",
    )


def test_round11_priority_is_the_archived_budgeted_block():
    # round-11 budget (ROTATION_STRIDE comment): stride raised to 29
    # FIRST (r10 verdict item #1), then the four new families the
    # verdict pre-scoped plus the four round-12 candidates pulled
    # forward mid-round
    assert q._ROUND11_PRIORITY == (
        "lineitem_stump_gini",
        "lineitem_tree_depth2",
        "docs_group_reservoir",
        "streaming_backfill_lag",
        "orders_scd2_priority",
        "docs_weighted_reservoir",
        "lineitem_gbt_stages",
        "streaming_upsert_latest",
    )


def test_round13_carried_block_retired_on_hard_rows():
    # The carry protocol's exit condition, settled by the hard
    # artifact: every name of the retired 19-name round-13 block
    # (archived as _ROUND13_PRIORITY) must carry a fully-green
    # CORRECTNESS_r11 row — only then may the live priority drop to
    # round-14's new entries.
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "CORRECTNESS_r11.json")) as f:
        r11 = json.load(f)
    assert len(q._ROUND13_PRIORITY) == 19
    assert q._ROUND13_PRIORITY[:8] == q._ROUND11_PRIORITY
    for name in q._ROUND13_PRIORITY:
        row = r11[name]
        assert row["hash_match"] and row["err"] is None, (name, row)


def test_round15_priority_is_exactly_the_budgeted_block():
    # round-15 budget (ROTATION_STRIDE comment): S raised to 33 FIRST
    # (N = 255 sat at the S=32 cap minus one), the 12-name round-14
    # block retired on its 12/12-green CORRECTNESS_r12 rows.
    assert q._ROUND14_PRIORITY == (
        "lineitem_status_reliability",
        "lineitem_binned_stump",
        "streaming_dlq_retention",
        # late block (§7.9 pull-forward after the green sweep)
        "lineitem_multi_binned_stump",
        "streaming_upsert_vacuum",
        # final block (S raised to 32 after the five-lane sweep)
        "lineitem_encoding_stump",
        "lineitem_status_multi_stump",
        "lineitem_quantile_gbt",
        "lineitem_quantile_tree",
        "streaming_upsert_retention",
        "lineitem_status_encoding_stump",
        "lineitem_quantile_gbt3",
    )
    assert q._ROUND15_PRIORITY == (
        "lineitem_status_quantile_gbt",
        "streaming_upsert_group_retention",
        "streaming_dlq_age_retention",
        # late block (§7.10 pull-forward after the green sweep)
        "lineitem_status_quantile_tree",
        "streaming_upsert_asof_read",
        "streaming_dlq_policy_retention",
        # final block (second green sweep)
        "streaming_upsert_changes",
        "lineitem_status_quantile_gbt3",
        "streaming_upsert_changes_window",
    )


def test_round15_carried_block_retired_on_hard_rows():
    # The carry protocol's exit condition for the round-15 block,
    # settled by the hard artifact at round-16 open: every name of
    # the retired 9-name block must carry a fully-green
    # CORRECTNESS_r13 row — only then may the live priority drop to
    # round-16's new entries and the stride rise past the N = 264
    # cap the block filled.
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "CORRECTNESS_r13.json")) as f:
        r13 = json.load(f)
    for name in q._ROUND15_PRIORITY:
        row = r13[name]
        assert row["hash_match"] and row["err"] is None, (name, row)


def test_round16_priority_is_the_archived_budgeted_block():
    # round-16 budget (ROTATION_STRIDE comment): S raised to 34 FIRST,
    # then the three §7.10 candidates plus the late/final pull-forward
    # blocks — archived at round-17 open once CORRECTNESS_r14 landed
    # hard rows for all eight.
    assert q._ROUND16_PRIORITY == (
        "streaming_upsert_changes_midwindow",
        "streaming_upsert_compaction",
        "lineitem_status_gbt_isotonic",
        # late block (pull-forward after the green five-lane sweep)
        "lineitem_gbt_isotonic",
        "lineitem_table_stats",
        "streaming_upsert_write_amplification",
        # final block (second green sweep)
        "docs_leakage_safe_split",
        "events_table_stats",
    )


def test_round16_carried_block_retired_on_hard_rows():
    # The carry protocol's exit condition for the round-16 block,
    # settled by the hard artifact at round-17 open: every name of
    # the retired 8-name block must carry a fully-green
    # CORRECTNESS_r14 row — only then may the live priority drop to
    # round-17's new entries and the stride rise past the N = 272
    # cap the block filled.
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "CORRECTNESS_r14.json")) as f:
        r14 = json.load(f)
    for name in q._ROUND16_PRIORITY:
        row = r14[name]
        assert row["hash_match"] and row["err"] is None, (name, row)


def test_round17_stride_budget():
    # round-17 budget (ROTATION_STRIDE comment): N = 272 sat EXACTLY
    # at the S = 34 horizon cap, so S rose to 35 FIRST (r14 verdict
    # item #4) BEFORE any growth; the new cap is 280 with priority
    # cap 15, and the round budget is the three r14-verdict
    # candidates (stream-stream FULL OUTER, sink SCD2, sketch-merged
    # table stats).
    assert q.ROTATION_STRIDE == 35
    assert 272 <= len(q.REGISTRY) <= 280
    assert math.ceil(len(q.REGISTRY) / q.ROTATION_STRIDE) <= 8
    assert len(q._ROUND_PRIORITY) <= 15
