"""Per-round benchmark: runs every harness query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {...}, "sf": <sf>}

Comparison target: BASELINE.md (the reference's recorded per-cell
wall-clock; its 2008 pipeline ≈146–231 s at 2.39 M rows with ~10+
redundant CSV re-scans). Our per-query timings are end-to-end: plan
construction + execution + collect of the (small) result.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import __spark_entry__ as entrymod
    from databricks_flight_etl_spark.session import get_spark

    spark = get_spark("flight-etl-bench")

    # warm the JVM / codegen / parquet footer caches so per-query numbers
    # measure steady-state execution, not one-time session startup
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).collect()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    total = 0.0
    # Fault-isolated per query: one broken query must never zero the
    # round's whole bench signal (round-1 lesson — the JSON line always
    # prints, failures are recorded, the summary stays comparable).
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            n = df.count()  # force full execution without driver transfer
        except Exception as exc:
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
        else:
            dt = time.time() - t0
            timings[name] = round(dt, 3)
            total += dt
            print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)
        finally:
            # operators pin shared intermediates (see operators.dedup._pin);
            # caches are per-query — drop so a 100+-query run stays flat
            try:
                spark.catalog.clearCache()
            except Exception:
                pass

    out = {
        "metric": "harness_suite_wall_clock",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
