"""Value-cardinality probe for grouped_cumsum (VERDICT r10 item 8):
the round-10 harness copied events.value verbatim per replica, so
distinct (event_type, value) stayed base-sized and the 100x probe
could not exercise the growth the bucketed rewrite targets.  With
--events-mode jitter replicas get value + r*1e-9 (distinct doubles,
per-group distributions moved by <= factor*1e-9), so the window
input — DISTINCT (event_type, value) pairs — grows with N and the
~5-task window-sort ceiling binds in-harness.

Build the corpora first:
    python tools/scale_probe.py build --src /root/testdata/sf0.1 \
        --dst /tmp/scale10x_vjit  --factor 10  --events-mode jitter --tables events
    ... --dst /tmp/scale100x_vjit  --factor 100  ...
    ... --dst /tmp/scale1000x_vjit --factor 1000 ...
Then:  SPARK_GRAFT_DRIVER_MEM=48g python tools/probe_cumsum_cardinality.py

Prints one JSON line per (corpus, form) with the wall time of the
sketch_exact_check cumulative pass (counts -> grouped_cumsum), min
of 2 after one warmup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPORA = [
    ("base", "/root/testdata/sf0.1"),
    ("x10", "/tmp/scale10x_vjit"),
    ("x100", "/tmp/scale100x_vjit"),
    ("x1000", "/tmp/scale1000x_vjit"),
]


def main() -> None:
    from pyspark.sql import functions as F

    from lofar_bf_pulsar_scripts_spark.operators.pipeline import grouped_cumsum
    from lofar_bf_pulsar_scripts_spark.session import get_spark
    from lofar_bf_pulsar_scripts_spark.tables import load_table

    spark = get_spark(app_name="probe_cumsum_cardinality")

    for tag, sf_dir in CORPORA:
        if not os.path.exists(os.path.join(sf_dir, "events.parquet")):
            print(json.dumps({"corpus": tag, "skipped": "not built"}))
            continue
        ev = load_table(spark, "events", sf_dir)
        counts = ev.groupBy("event_type", "value").agg(
            F.count(F.lit(1)).alias("c")
        )
        n_pairs = counts.count()
        # 2 timed runs after one warmup at small scales; at x1000 the
        # window form runs for minutes, so one timed run suffices
        n_runs = 2 if tag == "x1000" else 3
        for form, nb in (("window", None), ("bucketed", 32)):
            times = []
            for _ in range(n_runs):  # first run is warmup
                t = time.time()
                grouped_cumsum(
                    counts, ["event_type"], "value", "c",
                    n_buckets=nb, out_col="cum",
                ).write.format("noop").mode("overwrite").save()
                times.append(time.time() - t)
            print(
                json.dumps(
                    {
                        "corpus": tag,
                        "distinct_pairs": n_pairs,
                        "form": form,
                        "sec": round(min(times[1:]), 3),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
