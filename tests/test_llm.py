"""Unit tests for the LLM runtime: retry semantics (R25), concurrency,
gating, and the enrichment composition."""

from __future__ import annotations

import asyncio

import pytest
from pyspark.sql import functions as F

from gov_data_pipeline_spark.llm import (
    LLMRequest,
    MockLLMClient,
    RateLimitError,
    call_with_retry,
    llm_map,
)


class TestRetry:
    def test_succeeds_after_transient_failures(self):
        client = MockLLMClient(fail_first=3)
        sleeps: list[float] = []

        async def fake_sleep(d: float) -> None:
            sleeps.append(d)

        req = LLMRequest(messages=[{"role": "user", "content": "hi"}])
        out = asyncio.run(
            call_with_retry(lambda: client.complete(req), sleep=fake_sleep)
        )
        assert out == "hi"
        # reference backoff: 2, 4, 8 (doubling from 2s)
        assert sleeps == [2.0, 4.0, 8.0]

    def test_raises_after_max_retries(self):
        client = MockLLMClient(fail_first=99)

        async def fake_sleep(d: float) -> None:
            pass

        req = LLMRequest(messages=[{"role": "user", "content": "hi"}])
        with pytest.raises(RateLimitError):
            asyncio.run(
                call_with_retry(
                    lambda: client.complete(req), max_retries=5, sleep=fake_sleep
                )
            )


class TestLlmMap:
    def test_skip_and_complete(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha"), (2, ""), (3, "gamma")], "id long, txt string"
        )

        def build(row):
            if not row["txt"]:
                return None
            return LLMRequest(messages=[{"role": "user", "content": row["txt"]}])

        out = llm_map(df, build, "resp", MockLLMClient, initial_delay=0.0)
        rows = {r["id"]: r["resp"] for r in out.collect()}
        assert rows == {1: "alpha", 2: None, 3: "gamma"}

    def test_failed_request_nulls_row_not_partition(self, spark):
        """A request that exhausts retries yields a null cell; the other
        rows in the same partition still get their completions and the
        task does not fail/replay (ADVICE r1: gather(return_exceptions))."""

        class FlakyClient(MockLLMClient):
            async def complete(self, request):
                text = request.messages[-1]["content"]
                if text == "boom":
                    from gov_data_pipeline_spark.llm.client import RateLimitError

                    raise RateLimitError("permanent 429")
                return await super().complete(request)

        df = spark.createDataFrame(
            [(1, "alpha"), (2, "boom"), (3, "gamma")], "id long, txt string"
        ).coalesce(1)

        def build(row):
            return LLMRequest(messages=[{"role": "user", "content": row["txt"]}])

        out = llm_map(
            df, build, "resp", FlakyClient, max_retries=2, initial_delay=0.0
        )
        rows = {r["id"]: r["resp"] for r in out.collect()}
        assert rows == {1: "alpha", 2: None, 3: "gamma"}

    def test_programming_error_fails_task(self, spark):
        """A bug in build_request (not a request failure) must fail the
        job, not ship silent nulls."""
        df = spark.createDataFrame([(1, "alpha")], "id long, txt string")

        def build(row):
            return LLMRequest(
                messages=[{"role": "user", "content": row["missing_col"]}]
            )

        out = llm_map(df, build, "resp", MockLLMClient, initial_delay=0.0)
        with pytest.raises(Exception, match="missing_col|KeyError|PythonException"):
            out.collect()

    def test_auth_error_fails_task_not_silent_nulls(self, spark):
        """Bad credentials are a global failure: after retries exhaust,
        the job fails loudly instead of shipping an all-null column."""
        from gov_data_pipeline_spark.llm.client import AuthError

        class BadKeyClient(MockLLMClient):
            async def complete(self, request):
                raise AuthError("401 bad key")

        df = spark.createDataFrame([(1, "alpha")], "id long, txt string")

        def build(row):
            return LLMRequest(messages=[{"role": "user", "content": row["txt"]}])

        out = llm_map(
            df, build, "resp", BadKeyClient, max_retries=2, initial_delay=0.0
        )
        with pytest.raises(Exception, match="AuthError|401|PythonException"):
            out.collect()


class TestEnrichPieces:
    def test_ocr_gate_and_suffix(self, spark):
        import base64

        from gov_data_pipeline_spark.llm import ocr_enrich

        uri = "data:image/png;base64," + base64.b64encode(b"LOGO TEXT").decode()
        df = spark.createDataFrame(
            [
                (1, "", uri),          # -> OCR fills
                (2, "HasBrand", uri),  # brand present -> untouched
                (3, "", ""),           # no image -> untouched
            ],
            "id long, brand string, image string",
        )
        out = {r["id"]: r["brand"] for r in
               ocr_enrich(df, "brand", "image", MockLLMClient).collect()}
        assert out == {1: "LOGO TEXT (RECOG)", 2: "HasBrand", 3: ""}

    def test_brand_variants_strips_recog_and_gates(self, spark):
        from gov_data_pipeline_spark.llm import brand_variants

        df = spark.createDataFrame(
            [(1, "Acme 42 (RECOG)", "widgets"), (2, "", "x")],
            "id long, brand string, descr string",
        )
        out = {r["id"]: (r["variants_en"], r["variants_ru"]) for r in
               brand_variants(df, "brand", "descr", MockLLMClient).collect()}
        # digits stripped, RECOG removed; the '.' orphaned by digit
        # stripping is a punctuation-only token and gets dropped
        # (reference gpt.py:287-297 does the same).
        assert out[1] == ("ACME DESCRIPTION: WIDGETS", "acme description: widgets")
        assert out[2] == ("", "")

    def test_correct_rows_normalizes_values(self, spark):
        from gov_data_pipeline_spark.llm import correct_rows

        df = spark.createDataFrame([(1, "  a   b  ")], "id long, v string")
        out = correct_rows(df, MockLLMClient).collect()[0]
        assert out["v"] == "a b"
        assert out["id"] == "1"  # whole row goes through the string round-trip
