"""Custom stateful streaming operator: final state after draining the
stream must equal the batch aggregation."""

import pyspark.sql.functions as F

from lazy_frame_spark.sources.registry import load_table
from lazy_frame_spark.streaming import stream_events
from lazy_frame_spark.streaming.stateful import running_user_profile


def test_stateful_running_profile_matches_batch(spark, sf_dir, tmp_path):
    d = str(tmp_path / "ev")
    load_table(spark, sf_dir, "events").repartition(3).write.mode("overwrite").parquet(d)

    stream = stream_events(spark, d, spark.read.parquet(d).schema)
    prof = running_user_profile(stream)
    q = (
        prof.writeStream.format("memory")
        .queryName("t_profile")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # update-mode emits one row per user per batch; the LAST emission per
    # user is the final state
    got = spark.sql(
        """
        SELECT user_id, n_events, total_value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
          FROM t_profile) WHERE rn = 1
        """
    ).toPandas().set_index("user_id").sort_index()

    want = (
        spark.read.parquet(d)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .toPandas().set_index("user_id").sort_index()
    )
    assert got["n_events"].equals(want["n_events"])
    assert (got["total_value"] - want["total_value"]).abs().max() < 0.01
