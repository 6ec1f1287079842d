"""Full-registry differential sweep at an arbitrary SF directory.

The driver's t2 gate samples 50 queries per round at sf0.01; this
script runs the ENTIRE registry (Spark query AND DuckDB oracle,
rows/schema/value-hash compare — the same `tests/oracle.py` mirror the
suite uses) at whatever SF you point it at.  Round-13 purpose: the
registry had only ever been hash-verified complete at <=sf0.1, and both
the r08 HUGEINT class and the q187 rounding class only appeared when
scale grew — this is the sf1.0 closure of that risk.

Results are written INCREMENTALLY after every query (a crash or an OOM
keeps everything finished so far), with per-query Spark and DuckDB wall
times so the slowest oracles are data, not anecdote.

Usage::

    python scripts/oracle_sweep.py [sf_dir] [out_json] [--only q1,q2,...]
    # defaults: /tmp/sf1.0  SWEEP_sf1.0.json

Build /tmp/sf1.0 first: ``python scripts/make_scaled_sf.py``.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/tmp/sf1.0"
    out_path = args[1] if len(args) > 1 else os.path.join(
        REPO, f"SWEEP_{os.path.basename(sf_dir.rstrip('/'))}.json"
    )
    only: set[str] | None = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a[len("--only="):].split(","))

    from gov_data_pipeline_spark.queries import all_oracles, all_queries
    from gov_data_pipeline_spark.session import get_spark
    from tests.oracle import compare, duckdb_con, run_oracle

    spark = get_spark("oracle_sweep")
    con = duckdb_con(sf_dir)
    queries = all_queries()
    oracles = all_oracles()

    results: dict[str, dict] = {}
    if os.path.exists(out_path):  # resume a partial sweep
        with open(out_path) as f:
            results = json.load(f)

    names = [n for n in queries if only is None or n in only]
    todo = [n for n in names if n not in results]
    print(f"sweep {sf_dir}: {len(todo)} to run ({len(results)} already done)")

    for i, name in enumerate(todo):
        row: dict = {}
        t0 = time.monotonic()
        try:
            spark_pdf = queries[name](spark, sf_dir).toPandas()
            row["spark_sec"] = round(time.monotonic() - t0, 3)
            row["rows"] = len(spark_pdf)
            if name in oracles:
                t1 = time.monotonic()
                duck_pdf = run_oracle(con, oracles[name])
                row["duck_sec"] = round(time.monotonic() - t1, 3)
                res = compare(spark_pdf, duck_pdf)
                row["rows_match"] = res["rows_match"]
                row["hash_match"] = res["hash_match"]
                if not res["hash_match"]:
                    row["diag"] = {
                        k: v
                        for k, v in res.items()
                        if k in ("rows", "cols", "dtype_clash", "first_diffs")
                    }
            else:
                row["rows_match"] = row["rows"] >= 0
                row["hash_match"] = None
        except Exception:
            row["spark_sec"] = round(time.monotonic() - t0, 3)
            row["err"] = traceback.format_exc(limit=8)
            row["rows_match"] = False
            row["hash_match"] = False
        results[name] = row
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        status = (
            "GREEN" if row.get("hash_match")
            else ("rows-only" if row.get("hash_match") is None else "RED")
        )
        print(
            f"[{i + 1}/{len(todo)}] {name}: {status} "
            f"spark={row.get('spark_sec')}s duck={row.get('duck_sec', '-')}s",
            flush=True,
        )

    greens = sum(1 for r in results.values() if r.get("hash_match"))
    rows_only = sum(
        1 for r in results.values()
        if r.get("hash_match") is None and r.get("rows_match")
    )
    reds = [
        n for n, r in results.items()
        if not r.get("hash_match") and r.get("hash_match") is not None
    ]
    print(
        f"DONE: {greens} hash-green, {rows_only} rows-only, "
        f"{len(reds)} red: {reds}"
    )


if __name__ == "__main__":
    main()
