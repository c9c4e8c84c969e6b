"""Round-15 advisor fixes (ADVICE r12, four low items): reserved-name
guard on the quantile family's group_cols, df/binned mutual exclusion
in tree_depth2/gbt_boost, fit-time n_folds stamping so the grid guard
catches both mismatch directions, and the per-segment bench-probe
bracketing (covered by test_bench_contract against live artifacts)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from inf2106_map_reduce_spark.operators import stats


def _tiny_lineitemish(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "l_extendedprice": [1000.0 + 97.0 * i for i in range(60)],
                "l_quantity": [1.0 + i % 50 for i in range(60)],
                "l_discount": [(i % 11) / 100.0 for i in range(60)],
                "l_returnflag": ["R" if i % 3 == 0 else "N" for i in range(60)],
                "grp": ["a" if i % 2 == 0 else "b" for i in range(60)],
            }
        )
    )


def test_quantile_stump_multi_rejects_reserved_group_cols(spark):
    """A group column named like an internal histogram/stage column
    (feature, fb, bin, n, pos, cum, nt, ...) fails with intent instead
    of binding the wrong side of a window (ADVICE r12 #1)."""
    df = _tiny_lineitemish(spark)
    for bad in ("feature", "fb", "bin", "n", "pos", "cum", "nt",
                "b_price", "m2", "f1", "_x"):
        with pytest.raises(ValueError, match="collide with internal"):
            stats.quantile_stump_multi(
                df.withColumnRenamed("grp", bad),
                stats.QSTUMP_FEATURES,
                F.col("l_returnflag") == "R",
                group_cols=(bad,),
            )
    # a safe name still runs (plan-building only — no job needed)
    stats.quantile_stump_multi(
        df,
        stats.QSTUMP_FEATURES,
        F.col("l_returnflag") == "R",
        group_cols=("grp",),
    )


def test_quantile_bins_rejects_reserved_group_cols(spark):
    df = _tiny_lineitemish(spark)
    with pytest.raises(ValueError, match="collide with internal"):
        stats.quantile_bins(
            df.withColumnRenamed("grp", "cum"),
            "l_extendedprice",
            group_cols=("cum",),
        )


def test_tree_and_gbt_frame_params_are_mutually_exclusive(spark):
    """Passing both df and binned silently ignored df (a df/binned
    pair from different tables produced a result labeled as df's);
    both-or-neither now fail with intent (ADVICE r12 #3)."""
    df = _tiny_lineitemish(spark)
    binned = stats._stump_binned(df)
    with pytest.raises(ValueError, match="exactly one input frame"):
        stats.tree_depth2(df, binned=binned)
    with pytest.raises(ValueError, match="exactly one input frame"):
        stats.tree_depth2(None, binned=None)
    with pytest.raises(ValueError, match="exactly one input frame"):
        stats.gbt_boost(df, 2, binned=binned)
    with pytest.raises(ValueError, match="exactly one input frame"):
        stats.gbt_boost(None, 2)


def _enc_frame(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "cat": [f"c{i % 7}" for i in range(80)],
                "k": [str(i) for i in range(80)],
                "y": [i % 3 == 0 for i in range(80)],
            }
        )
    )


def test_grid_fold_guard_catches_both_directions(spark):
    """target_encoding stamps its fit-time n_folds on the returned
    frame; consumers re-deriving folds under a DIFFERENT n_folds fail
    with intent in BOTH directions — the fewer-folds side previously
    slipped through as silent row drops at the (category, fold) join
    (ADVICE r12 #4)."""
    df = _enc_frame(spark)
    grid3 = stats.target_encoding(
        df, "cat", F.col("k"), F.col("y"), n_folds=3
    )
    # more folds than the consumer: caught (was already)
    with pytest.raises(ValueError, match="n_folds"):
        stats.encoding_reliability(
            df, "cat", F.col("k"), F.col("y"), n_folds=2, grid=grid3
        )
    # FEWER folds than the consumer: now caught via the stamp
    with pytest.raises(ValueError, match="n_folds"):
        stats.encoding_reliability(
            df, "cat", F.col("k"), F.col("y"), n_folds=5, grid=grid3
        )
    with pytest.raises(ValueError, match="n_folds"):
        stats.encoding_stump(
            df, "cat", F.col("k"), F.col("y"), n_folds=5, grid=grid3
        )
    # matching n_folds passes through
    stats.encoding_reliability(
        df, "cat", F.col("k"), F.col("y"), n_folds=3, grid=grid3
    )


def test_grid_fold_guard_unstamped_fallback(spark):
    """A foreign (unstamped) grid falls back to the one-job
    necessary-condition check: more-folds still caught, fewer-folds
    documented as the caller's side."""
    df = _enc_frame(spark)
    grid3 = stats.target_encoding(
        df, "cat", F.col("k"), F.col("y"), n_folds=3
    )
    foreign = grid3.select("*")  # drops the Python attribute
    assert not hasattr(foreign, "_enc_n_folds")
    with pytest.raises(ValueError, match="fold ids up to"):
        stats.encoding_reliability(
            df, "cat", F.col("k"), F.col("y"), n_folds=2, grid=foreign
        )
