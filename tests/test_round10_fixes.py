"""Round-10 ADVICE regression pins — each fix carries a differential
test in the same round (the r07–r09 standard):

- ``stats._shuffle_width`` must survive a non-numeric
  ``spark.sql.shuffle.partitions`` ("auto" on AQE-managed platforms);
- ``ann_nn_join(snapshot_cond=...)`` must accept a condition written
  against the CALLER's id column (previously AnalysisException — the
  frame had already renamed it);
- ``embedding_cosine_pairs(n_rows=...)`` must skip the eager
  bounded-count probe without changing results on either side of the
  fast-path gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from inf2106_map_reduce_spark.functions import dedup, vector
from inf2106_map_reduce_spark.operators import stats
from inf2106_map_reduce_spark.tables import load_table

SF_SMALL = "/root/testdata/sf0.001"


class _FakeConf:
    def __init__(self, value):
        self._value = value

    def get(self, key):
        return self._value


class _FakeSC:
    defaultParallelism = 7


class _FakeSession:
    conf = _FakeConf("auto")
    sparkContext = _FakeSC()


def test_shuffle_width_falls_back_on_non_numeric_conf(spark):
    # AQE-managed platforms report "auto" — the helper must fall back
    # to defaultParallelism instead of raising ValueError
    assert stats._shuffle_width(_FakeSession()) == 7
    # and on a real session it returns the numeric conf unchanged
    assert stats._shuffle_width(spark) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )


def test_nn_join_snapshot_cond_accepts_caller_id_col(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    # a condition written against the documented id_col default — the
    # natural caller spelling that used to raise AnalysisException
    cond = F.col("vec_id") % vector.NN_SNAPSHOT_MOD < vector.NN_SNAPSHOT_LT
    got = {
        (r.vec_id, r.nn_id, r.cos_sim)
        for r in vector.ann_nn_join(emb, snapshot_cond=cond).collect()
    }
    dflt = {
        (r.vec_id, r.nn_id, r.cos_sim)
        for r in vector.ann_nn_join(emb).collect()
    }
    assert got == dflt and got


def test_cosine_pairs_known_n_rows_skips_probe_same_result(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    n = emb.count()
    probe = {
        (r.id_a, r.id_b, r.cos_sim)
        for r in dedup.embedding_cosine_pairs(emb).collect()
    }
    # caller-known count below the cap: fast path, no probe job
    known = {
        (r.id_a, r.id_b, r.cos_sim)
        for r in dedup.embedding_cosine_pairs(emb, n_rows=n).collect()
    }
    # caller-known count above the cap: distributed path, no probe job
    forced = {
        (r.id_a, r.id_b, r.cos_sim)
        for r in dedup.embedding_cosine_pairs(
            emb, n_rows=dedup.COSINE_SINGLE_BATCH_CAP + 1
        ).collect()
    }
    assert known == probe
    assert forced == probe


def test_plan_with_confs_restores_session_confs(spark):
    """bloom_runtime_join plans under scoped thresholds; every conf it
    touches (including autoBroadcastJoinThreshold=-1, which would
    de-broadcast EVERY later dimension join if leaked) must be back to
    its session value after the call."""
    from inf2106_map_reduce_spark.sources import roundtrip

    keys = list(roundtrip.BLOOM_JOIN_CONFS)
    before = {k: spark.conf.get(k, None) for k in keys}
    df = roundtrip.bloom_runtime_join(spark, SF_SMALL)
    after = {k: spark.conf.get(k, None) for k in keys}
    assert after == before, (before, after)
    # the registry entry returns the EXECUTED (checkpointed) rows; the
    # frozen-plan inspection lives on the _plan helper
    from inf2106_map_reduce_spark.plans import explain_str

    assert "might_contain" in explain_str(
        roundtrip.bloom_runtime_join_plan(spark, SF_SMALL), "formatted"
    ).lower()
    assert df.count() > 0
