"""operators/scoring — hashed-feature linear model scoring (q164)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def _h1(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


def _model_weight(feature_id: int, spread: int = 1000) -> int:
    return _h1(str(feature_id)) % (2 * spread + 1) - spread


def _expected_logit(text: str, n_features: int) -> int:
    import re

    canon = re.sub(r"[^A-Za-z0-9]+", " ", text).strip().lower()
    if not canon:
        return 0
    ws = canon.split(" ")
    grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    return sum(_model_weight(_h1(g) % n_features) for g in grams)


class TestScoreLinearModel:
    def test_logit_matches_hand_computed_model(self, spark):
        """Bit-exact pin of the whole chain — canonicalization, unigram
        + bigram features, md5 feature hashing, weight lookup, integer
        sum — against an independent pure-Python model."""
        from gov_data_pipeline_spark.operators.scoring import (
            pseudo_weights,
            score_linear_model,
        )

        n = 1 << 10
        rows = [
            (1, "Hello, World!"),
            (2, "the quick brown fox JUMPS over the lazy dog"),
            (3, "Hello hello HELLO"),  # repeated token: tf=3 not 1
            (4, "one"),  # single word: no bigrams
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: r.logit
            for r in score_linear_model(
                docs,
                "doc_id",
                F.col("text"),
                pseudo_weights(spark, n_features=n),
                n_features=n,
                hash_family="md5",
            ).collect()
        }
        want = {i: _expected_logit(t, n) for i, t in rows}
        assert got == want

    def test_zero_feature_docs_keep_the_intercept(self, spark):
        from gov_data_pipeline_spark.operators.scoring import (
            pseudo_weights,
            score_linear_model,
        )

        docs = spark.createDataFrame(
            [(1, "!!! ***"), (2, ""), (3, None), (4, "   ")],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: (r.logit, r.kept)
            for r in score_linear_model(
                docs,
                "doc_id",
                F.col("text"),
                pseudo_weights(spark, n_features=64),
                n_features=64,
                intercept=5,
                threshold=10,
                hash_family="md5",
            ).collect()
        }
        assert out == {i: (5, False) for i in (1, 2, 3, 4)}

    def test_threshold_gates_kept(self, spark):
        from gov_data_pipeline_spark.operators.scoring import (
            pseudo_weights,
            score_linear_model,
        )

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma")], "doc_id long, text string"
        )
        w = pseudo_weights(spark, n_features=256)
        logit = score_linear_model(
            docs, "doc_id", F.col("text"), w, n_features=256,
            hash_family="md5",
        ).collect()[0].logit
        for thr, want in ((logit, True), (logit + 1, False)):
            r = score_linear_model(
                docs, "doc_id", F.col("text"), w, n_features=256,
                threshold=thr, hash_family="md5",
            ).collect()[0]
            assert r.kept is want

    def test_model_join_is_broadcast(self, spark):
        """The weights table must reach executors as a broadcast — a
        shuffled model join would move corpus-sized feature rows."""
        from gov_data_pipeline_spark.operators.scoring import (
            pseudo_weights,
            score_linear_model,
        )

        docs = spark.createDataFrame(
            [(1, "a b c")], "doc_id long, text string"
        )
        plan = score_linear_model(
            docs, "doc_id", F.col("text"),
            pseudo_weights(spark, n_features=1 << 12),
            n_features=1 << 12,
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_hash_families_agree_on_structure(self, spark):
        """xxhash64 (scale default) and md5 (oracle family) must build
        the same number of features per document — only the bucket ids
        differ."""
        from gov_data_pipeline_spark.operators.scoring import (
            hashed_token_features,
        )

        docs = spark.createDataFrame(
            [(1, "w1 w2 w3 w1"), (2, "solo")], "doc_id long, text string"
        )
        for fam in ("xxhash64", "md5"):
            feats = hashed_token_features(
                docs, "doc_id", F.col("text"), n_features=1 << 20,
                hash_family=fam,
            )
            tf_total = {
                r.doc_id: r.s
                for r in feats.groupBy("doc_id")
                .agg(F.sum("tf").alias("s"))
                .collect()
            }
            # doc 1: 4 unigrams + 3 bigrams; doc 2: 1 unigram
            assert tf_total == {1: 7, 2: 1}, fam


class TestProfileColumns:
    """operators/expect.profile_columns — the SUMMARIZE-style datasheet
    (q166)."""

    def test_profile_matches_hand_computed(self, spark):
        from gov_data_pipeline_spark.operators.expect import profile_columns

        df = spark.createDataFrame(
            [
                (1, 2.5, "x"),
                (2, None, "y"),
                (2, 7.0, None),
                (None, 2.5, "x"),
            ],
            "k long, v double, s string",
        )
        got = {
            r.column: (r.n_rows, r.n_null, r.n_distinct, r.min_str, r.max_str)
            for r in profile_columns(df).collect()
        }
        assert got == {
            "k": (4, 1, 2, "1", "2"),
            "v": (4, 1, 2, "2.5", "7.0"),
            "s": (4, 1, 2, "x", "y"),
        }

    def test_profile_single_scan_no_join(self, spark, sf_dir):
        """The whole profile must be ONE pass: one scan of the table,
        no joins, no per-column union of aggregates."""
        from gov_data_pipeline_spark.queries.quality import q166_column_profile

        plan = (
            q166_column_profile(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("orders.parquet") == 1
        assert "Join" not in plan
        assert "Union" not in plan

    def test_profile_approx_mode_and_unknown_column(self, spark):
        import pytest as _pytest

        from gov_data_pipeline_spark.operators.expect import profile_columns

        df = spark.range(1000).select(F.col("id").alias("k"))
        row = profile_columns(df, exact_distinct=False).collect()[0]
        # HLL at rsd 5%: the estimate is near 1000, not exact-pinned
        assert 900 <= row.n_distinct <= 1100
        with _pytest.raises(ValueError, match="unknown column"):
            profile_columns(df, ["nope"])


class TestUnicodeTokenMode:
    def test_unicode_logit_matches_hand_computed_model(self, spark):
        """token_classes="unicode" pin: Cyrillic/CJK tokens produce
        real hashed features (ASCII mode scores these documents the
        bare intercept), bit-exact against the same pure-Python model
        with the unicode canonicalization applied."""
        import re as _re

        from gov_data_pipeline_spark.operators.scoring import (
            pseudo_weights,
            score_linear_model,
        )

        n = 1 << 10

        def expected(text: str) -> int:
            canon = _re.sub(
                r"[^\w]+", " ", text, flags=_re.UNICODE
            )  # \w ≈ \p{L}\p{N} here; fixture avoids '_'
            canon = canon.strip()
            canon = canon.translate(
                str.maketrans(
                    "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
                    "abcdefghijklmnopqrstuvwxyz",
                )
            )
            if not canon:
                return 0
            ws = canon.split(" ")
            grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
            return sum(_model_weight(_h1(g) % n) for g in grams)

        rows = [
            (1, "Привет, мир!"),
            (2, "ПРИВЕТ МИР"),  # Cyrillic case variant: different logit
            (3, "Hello, World! Привет"),
            (4, "你好 世界"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: r.logit
            for r in score_linear_model(
                docs,
                "doc_id",
                F.col("text"),
                pseudo_weights(spark, n_features=n),
                n_features=n,
                hash_family="md5",
                token_classes="unicode",
            ).collect()
        }
        want = {i: expected(t) for i, t in rows}
        assert got == want
        assert got[1] != 0 and got[4] != 0  # non-Latin scores for real
        assert got[1] != got[2]  # non-ASCII case stays significant


class TestCjkTokenMode:
    def test_cjk_features_are_char_grams(self, spark):
        """token_classes="cjk" pin (the r10 verdict's CJK gap): a
        separator-free Han document yields ONE feature row per
        distinct gram under "unicode" (the whole run is one token) but
        char-1/2-gram features under "cjk", bit-exact against the same
        pure-Python model with the per-character canonicalization."""
        from gov_data_pipeline_spark.operators.scoring import (
            hashed_token_features,
            pseudo_weights,
            score_linear_model,
        )

        n = 1 << 10
        han = "的一是不了人我在有"  # separator-free run
        docs = spark.createDataFrame(
            [(1, han)], "doc_id long, text string"
        )
        uni_rows = hashed_token_features(
            docs, "doc_id", F.col("text"), n_features=n,
            hash_family="md5", token_classes="unicode",
        ).count()
        cjk_rows = hashed_token_features(
            docs, "doc_id", F.col("text"), n_features=n,
            hash_family="md5", token_classes="cjk",
        ).count()
        assert uni_rows == 1  # one sentence-sized token (+its 0 bigrams)
        # 9 char unigrams + 8 char bigrams, all distinct -> 17 rows
        # (modulo hash collisions into the same bucket)
        assert cjk_rows >= 15

        def expected(text: str) -> int:
            chars = list(text)
            grams = chars + [
                f"{a} {b}" for a, b in zip(chars, chars[1:])
            ]
            return sum(_model_weight(_h1(g) % n) for g in grams)

        got = {
            r.doc_id: r.logit
            for r in score_linear_model(
                docs,
                "doc_id",
                F.col("text"),
                pseudo_weights(spark, n_features=n),
                n_features=n,
                hash_family="md5",
                token_classes="cjk",
            ).collect()
        }
        assert got == {1: expected(han)}


class TestTrainLinearModel:
    N_ITER = 2

    def test_two_iterations_match_hand_computed_recurrence(self, spark):
        """Bit-exact pin of the fixed-point trainer: an independent
        pure-Python replay of the documented recurrence (z -> hard
        sigmoid -> err -> grad -> truncating-div step) over a tiny
        labeled fixture must reproduce every trained weight."""
        import re as _re

        from gov_data_pipeline_spark.operators.scoring import (
            train_linear_model,
        )

        n, lr_den = 1 << 10, 10
        rows = [
            (1, "good clean prose here", 1),
            (2, "spam spam buy now", 0),
            (3, "good prose wins again", 1),
            (4, "buy spam now now now", 0),
            (5, "", 0),  # featureless doc: err contributes nowhere
        ]

        def feats(text):
            canon = _re.sub(r"[^A-Za-z0-9]+", " ", text).strip().lower()
            if not canon:
                return {}
            ws = canon.split(" ")
            grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
            out = {}
            for g in grams:
                f = _h1(g) % n
                out[f] = out.get(f, 0) + 1
            return out

        def trunc_div(a, b):
            q = abs(a) // b
            return q if a >= 0 else -q

        F_ = {i: feats(t) for i, t, _ in rows}
        Y = {i: y * 1000 for i, _, y in rows}
        w = {}
        for it in range(self.N_ITER):
            errs = {}
            for i in F_:
                z = sum(tf * w.get(f, 0) for f, tf in F_[i].items())
                p = min(1000, max(0, 500 + trunc_div(z, 4)))
                errs[i] = p - Y[i]
            grad = {}
            for i, fs in F_.items():
                for f, tf in fs.items():
                    grad[f] = grad.get(f, 0) + tf * errs[i]
            for f, g in grad.items():
                w[f] = w.get(f, 0) - trunc_div(g, lr_den)

        docs = spark.createDataFrame(
            [(i, t, y) for i, t, y in rows],
            "doc_id long, text string, y int",
        )
        got = {
            r.feature_id: r.weight
            for r in train_linear_model(
                docs,
                "doc_id",
                F.col("text"),
                F.col("y"),
                n_features=n,
                n_iter=self.N_ITER,
                lr_den=lr_den,
                hash_family="md5",
            ).collect()
        }
        want = {f: v for f, v in w.items()}
        assert got == want
        assert any(v != 0 for v in got.values())


class TestTrainLinearModelOneIter(TestTrainLinearModel):
    """n_iter=1: the all-zero init path alone."""

    N_ITER = 1


class TestTrainLinearModelThreeIter(TestTrainLinearModel):
    """n_iter=3: the recurrence generalizes past the oracle-unrolled
    two rounds — the loop, not the unrolling, is the contract."""

    N_ITER = 3


def test_temperature_quota_apportionment_invariants(spark, tmp_path):
    """Largest-remainder apportionment on a constructed skew: quotas
    sum EXACTLY to the budget under both policies (no float rounding
    can gain or lose a unit), proportional quotas track size, and the
    α=0.5 temperature compresses the spread — small sources keep more
    representation than their share."""
    import gov_data_pipeline_spark.queries.corpus_ops as co

    # 3 sources with 1/10/100 docs of equal n_chars
    rows = []
    did = 0
    for src, n in (("tiny", 1), ("mid", 10), ("big", 100)):
        for _ in range(n):
            rows.append((did, src, 40))
            did += 1
    base = str(tmp_path / "sk")
    spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    ).write.parquet(base + "/documents.parquet")
    out = {
        r["source"]: (r["quota_prop"], r["quota_temp"])
        for r in co.q174_temperature_quota(spark, base).collect()
    }
    sp = sum(v[0] for v in out.values())
    st = sum(v[1] for v in out.values())
    assert sp == st == co._Q174_BUDGET
    assert out["big"][0] > out["mid"][0] > out["tiny"][0]
    # temperature lifts the tiny source and trims the big one
    assert out["tiny"][1] > out["tiny"][0]
    assert out["big"][1] < out["big"][0]
    spread_prop = out["big"][0] - out["tiny"][0]
    spread_temp = out["big"][1] - out["tiny"][1]
    assert spread_temp < spread_prop


class TestMulticlassModel:
    def test_routing_matches_hand_computed_counts(self, spark):
        """class_count_model weights are exact per-class tfs and
        score_multiclass_model routes by their dot product: docs built
        from two disjoint vocabularies route to their own class with a
        hand-computable winning logit."""
        from gov_data_pipeline_spark.operators.scoring import (
            class_count_model,
            score_multiclass_model,
        )

        rows = [
            (1, "aa bb aa", "x"),
            (2, "aa bb", "x"),
            (3, "cc dd cc", "y"),
            (4, "dd cc", "y"),
        ]
        docs = spark.createDataFrame(rows, "id long, t string, lab string")
        model = class_count_model(
            docs, "id", F.col("t"), F.col("lab"),
            n_features=1 << 16, bigrams=False,
        )
        got = {
            (r.class_id, r.feature_id): r.weight for r in model.collect()
        }
        # class x: aa tf=3, bb tf=2; class y: cc tf=3, dd tf=2
        assert sorted(w for (c, _), w in got.items() if c == "x") == [2, 3]
        assert sorted(w for (c, _), w in got.items() if c == "y") == [2, 3]
        routed = {
            r.id: (r.pred_class, r.logit)
            for r in score_multiclass_model(
                docs, "id", F.col("t"), model,
                n_features=1 << 16, bigrams=False,
            ).collect()
        }
        # doc1: logit_x = 2*3 + 1*2 = 8 (aa tf2, bb tf1); logit_y absent
        assert routed[1] == ("x", 8)
        assert routed[3] == ("y", 8)
        assert routed[2][0] == "x" and routed[4][0] == "y"

    def test_hashed_features_carry_column(self, spark):
        """hashed_token_features(carry=[...]): per-doc columns ride
        the explode and the tf groupBy unchanged, and the (feature,
        tf) multiset is identical to the carry-free call. (The carry
        form feeds class_count_model(feats_class_col=...) when the
        frame is pinned — r13; the join form remains for callers
        without a prebuilt frame.)"""
        from gov_data_pipeline_spark.operators.scoring import (
            hashed_token_features,
        )

        docs = spark.createDataFrame(
            [(1, "aa bb aa", "x"), (2, "cc", "y")],
            "id long, t string, lab string",
        )
        plain = hashed_token_features(
            docs, "id", F.col("t"), n_features=1 << 10, bigrams=False
        )
        carried = hashed_token_features(
            docs, "id", F.col("t"), n_features=1 << 10, bigrams=False,
            carry=["lab"],
        )
        want_lab = {1: "x", 2: "y"}
        rows = carried.collect()
        assert all(r.lab == want_lab[r.id] for r in rows)
        assert sorted((r.id, r.feature_id, r.tf) for r in rows) == sorted(
            (r.id, r.feature_id, r.tf) for r in plain.collect()
        )

    def test_class_count_model_carry_equals_join_form(self, spark):
        """class_count_model(feats=..., feats_class_col=...) — the r13
        no-join aggregate over a label-carrying feature frame — must
        produce exactly the (class_id, feature_id, weight) rows of the
        join form: every feats row carries exactly one label, so
        grouping by the carried label is grouping by the joined one."""
        from gov_data_pipeline_spark.operators.scoring import (
            class_count_model,
            hashed_token_features,
        )

        docs = spark.createDataFrame(
            [
                (1, "aa bb aa", "x"),
                (2, "cc bb", "y"),
                (3, "aa cc", "x"),
            ],
            "id long, t string, lab string",
        )
        joined = class_count_model(
            docs, "id", F.col("t"), F.col("lab"), n_features=1 << 10
        )
        carried_feats = hashed_token_features(
            docs, "id", F.col("t"), n_features=1 << 10, carry=["lab"]
        )
        carried = class_count_model(
            docs,
            "id",
            F.col("t"),
            F.col("lab"),
            n_features=1 << 10,
            feats=carried_feats,
            feats_class_col="lab",
        )
        assert sorted(map(tuple, carried.collect())) == sorted(
            map(tuple, joined.collect())
        )
        # the carry path must not plan a per-doc join at all
        assert "Join" not in carried._sc._jvm.PythonSQLUtils.explainString(
            carried._jdf.queryExecution(), "formatted"
        )

    def test_hashed_features_carry_collision_raises(self, spark):
        """carry names that collide with the id or a generated column
        ('feature_id', 'tf', '__g') must raise instead of silently
        producing duplicate/ambiguous columns and wrong tf counts —
        mirrors write_jsonl's taken-name guard (round-12 advice)."""
        import pytest as _pytest

        from gov_data_pipeline_spark.operators.scoring import (
            hashed_token_features,
        )

        docs = spark.createDataFrame(
            [(1, "aa bb", 7)], "id long, t string, feature_id long"
        )
        for bad in ("id", "feature_id", "tf", "__g"):
            with _pytest.raises(ValueError, match=bad):
                hashed_token_features(
                    docs, "id", F.col("t"), n_features=64, carry=[bad]
                )

    def test_argmax_ties_break_to_smallest_class_id(self, spark):
        from gov_data_pipeline_spark.operators.scoring import (
            score_multiclass_model,
        )

        docs = spark.createDataFrame([(1, "tok")], "id long, t string")
        # both classes give 'tok' identical weight -> tie -> 'a' wins
        from gov_data_pipeline_spark.operators.scoring import (
            hashed_token_features,
        )

        feats = hashed_token_features(
            docs, "id", F.col("t"), n_features=1 << 8, bigrams=False
        )
        fid = feats.collect()[0].feature_id
        w = spark.createDataFrame(
            [("b", fid, 5), ("a", fid, 5)],
            "class_id string, feature_id long, weight long",
        )
        out = score_multiclass_model(
            docs, "id", F.col("t"), w, n_features=1 << 8, bigrams=False
        ).collect()[0]
        assert (out.pred_class, out.logit) == ("a", 5)

    def test_featureless_docs_route_null(self, spark):
        from gov_data_pipeline_spark.operators.scoring import (
            score_multiclass_model,
        )

        docs = spark.createDataFrame(
            [(1, "zz"), (2, None), (3, "   ")], "id long, t string"
        )
        w = spark.createDataFrame(
            [("a", 0, 1)], "class_id string, feature_id long, weight long"
        )
        out = {
            r.id: (r.pred_class, r.logit)
            for r in score_multiclass_model(
                docs, "id", F.col("t"), w, n_features=1 << 8, bigrams=False
            ).collect()
        }
        # doc1 has a feature but misses the model; 2/3 have none at all
        assert out[1] == (None, None)
        assert out[2] == (None, None)
        assert out[3] == (None, None)
