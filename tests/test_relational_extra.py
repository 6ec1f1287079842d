"""Units for the skew/upsert relational operators (q71-q73 backing)."""

from pyspark.sql import functions as F

from gov_data_pipeline_spark.operators.relational import salted_join, upsert_latest


class TestSaltedJoin:
    def test_inner_matches_plain_join(self, spark):
        big = spark.createDataFrame(
            [(i % 3, f"v{i}") for i in range(100)], "k long, payload string"
        )
        small = spark.createDataFrame(
            [(0, "zero"), (1, "one"), (2, "two"), (9, "unused")],
            "k long, name string",
        )
        got = {tuple(r) for r in salted_join(big, small, ["k"], salt=8).collect()}
        want = {tuple(r) for r in big.join(small, ["k"]).collect()}
        assert got == want and len(want) == 100

    def test_left_keeps_unmatched(self, spark):
        big = spark.createDataFrame([(1, "a"), (5, "b")], "k long, payload string")
        small = spark.createDataFrame([(1, "one")], "k long, name string")
        got = {tuple(r) for r in salted_join(big, small, ["k"], salt=4, how="left").collect()}
        want = {tuple(r) for r in big.join(small, ["k"], "left").collect()}
        assert got == want
        assert (5, "b", None) in got

    def test_rejects_outer(self, spark):
        import pytest

        df = spark.range(1)
        with pytest.raises(ValueError):
            salted_join(df, df, ["id"], how="full")


class TestUpsertLatest:
    def test_update_wins_and_inserts_append(self, spark):
        base = spark.createDataFrame(
            [(1, "old", 0), (2, "keep", 0)], "k long, v string, version int"
        )
        updates = spark.createDataFrame(
            [(1, "new", 1), (3, "ins", 1)], "k long, v string, version int"
        )
        got = {
            r["k"]: r["v"]
            for r in upsert_latest(base, updates, ["k"], "version").collect()
        }
        assert got == {1: "new", 2: "keep", 3: "ins"}
