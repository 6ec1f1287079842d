"""``llm_map`` — the batched async model-call column (SURVEY L1).

The reference awaits one request per row on a single event loop
(``utils/gpt.py:386-460``) — its biggest performance naïveté. Here the
same work runs as:

- ``mapInPandas``: Arrow-batched partitions, so each Python worker gets
  thousands of rows per batch, not one;
- an asyncio event loop *per batch* with a bounded-concurrency gather:
  ``concurrency`` requests in flight per task, times however many tasks
  the cluster runs — at 1000 executors the pipeline sustains
  1000 × concurrency requests in flight vs the reference's 1;
- R25 retry/backoff per request inside the batch (a failed request
  retries alone; the partition is never replayed);
- rows whose request builder returns ``None`` are skipped for free
  (the gating predicates — exclusion, empty-brand — are evaluated as
  native columns *before* the UDF, so excluded rows never cross the
  Arrow boundary at all when ``prefilter`` is used).
"""

from __future__ import annotations

import asyncio
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from gov_data_pipeline_spark.llm.client import (
    LLMRequest,
    RateLimitError,
    TransientAPIError,
    call_with_retry,
)

ClientFactory = Callable[[], Any]
RequestBuilder = Callable[[dict[str, Any]], LLMRequest | None]

# Error types that null the row instead of failing the task: the
# request-level failures a model endpoint emits. Programming errors
# (KeyError, AttributeError, ...) propagate and fail the task — and so
# does AuthError: bad credentials are a global, deterministic failure
# (every row would null silently otherwise), so after its R25 retries
# exhaust it fails the job loudly rather than shipping an all-null
# column.
NONFATAL_ERRORS: tuple[type[Exception], ...] = (
    RateLimitError,
    TransientAPIError,
    TimeoutError,
    ConnectionError,
)


def _run_batch(
    pdf: pd.DataFrame,
    build_request: RequestBuilder,
    client: Any,
    concurrency: int,
    max_retries: int,
    initial_delay: float,
    nonfatal_errors: tuple[type[Exception], ...] = NONFATAL_ERRORS,
) -> list[str | None]:
    async def run() -> list[str | None]:
        sem = asyncio.Semaphore(concurrency)

        async def one(row: dict[str, Any]) -> str | None:
            req = build_request(row)
            if req is None:
                return None
            async with sem:
                return await call_with_retry(
                    lambda: client.complete(req),
                    max_retries=max_retries,
                    initial_delay=initial_delay,
                )

        results = await asyncio.gather(
            *[one(r) for r in pdf.to_dict(orient="records")],
            return_exceptions=True,
        )
        # A request that exhausted its retries yields a null cell
        # instead of failing the Spark task — otherwise one bad row
        # replays the whole partition, re-sending every other row's
        # request to the model endpoint. Only the declared request
        # error types are nulled: a programming error (KeyError in
        # build_request, a typo'd attribute) or a cancellation must
        # still fail loudly, not ship as silent nulls.
        out: list[str | None] = []
        for r in results:
            if isinstance(r, nonfatal_errors):
                out.append(None)
            elif isinstance(r, BaseException):
                raise r
            else:
                out.append(r)
        return out

    return asyncio.run(run())


def llm_map(
    df: DataFrame,
    build_request: RequestBuilder,
    output_col: str,
    client_factory: ClientFactory,
    concurrency: int = 8,
    max_retries: int = 5,
    initial_delay: float = 2.0,
    gate: "F.Column | None" = None,
    nonfatal_errors: tuple[type[Exception], ...] = NONFATAL_ERRORS,
) -> DataFrame:
    """Append ``output_col`` (string) = model completion per row.

    ``build_request`` maps a row dict to an ``LLMRequest`` (or ``None``
    to skip). ``client_factory`` is constructed once per partition on
    the executor (connection reuse across the batch); it must be
    picklable.

    ``gate`` (native boolean Column): rows failing it bypass the Python
    worker entirely — they get a null ``output_col`` via a filtered
    union, never crossing the Arrow boundary. With sparse gates (the
    usual case: only a fraction of rows need the model) this removes
    most of the UDF serialization cost; ``build_request`` returning
    ``None`` remains the row-level skip inside gated batches.
    """
    if gate is not None:
        need = df.filter(gate)
        skip = df.filter(~F.coalesce(gate, F.lit(False))).withColumn(
            output_col, F.lit(None).cast("string")
        )
        mapped = llm_map(
            need,
            build_request,
            output_col,
            client_factory,
            concurrency,
            max_retries,
            initial_delay,
            gate=None,
            nonfatal_errors=nonfatal_errors,
        )
        return mapped.unionByName(skip)
    # mapInPandas cannot resolve column names containing dots (registry
    # columns like "Рег. №" do), so the UDF boundary runs under
    # positional placeholder names; the mapper sees the real names.
    orig = list(df.columns)
    safe = [f"__c{i}" for i in range(len(orig))]
    out_schema = T.StructType(
        [
            T.StructField(s, f.dataType, f.nullable)
            for s, f in zip(safe, df.schema.fields)
        ]
        + [T.StructField("__out", T.StringType(), True)]
    )

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()
        for pdf in batches:
            pdf = pdf.copy()
            pdf.columns = orig
            results = _run_batch(
                pdf,
                build_request,
                client,
                concurrency,
                max_retries,
                initial_delay,
                nonfatal_errors,
            )
            out = pdf.assign(__out=pd.Series(results, index=pdf.index, dtype="object"))
            out.columns = safe + ["__out"]
            yield out

    return df.toDF(*safe).mapInPandas(mapper, schema=out_schema).toDF(*orig, output_col)
