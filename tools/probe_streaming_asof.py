"""Round-14 (VERDICT item 4): instrument the streaming as-of pair.
``streaming_asof_joins_exact`` regressed raw two rounds running
(3.94 -> 5.47 s) with UNTOUCHED code; the verdict asks for
micro-batch count, per-batch wall, and state-store commit time over
3 repeated runs, so the movement can be attributed to a plan change
(none expected), batch-count nondeterminism, or state-store/commit
timing variance — and then either pinned or banded.

A StreamingQueryListener records every query's progress without
touching the gate code: batch ids, triggerExecution durations, and
stateOperators commit/total-rows metrics.

Usage: python tools/probe_streaming_asof.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql.streaming import StreamingQueryListener

    from lofar_bf_pulsar_scripts_spark.registry import queries
    from lofar_bf_pulsar_scripts_spark.session import get_spark

    spark = get_spark(app_name="probe_streaming_asof")

    progress: list[dict] = []

    class Rec(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            ops = [
                {
                    "commitMs": s.commitTimeMs,
                    "rowsTotal": s.numRowsTotal,
                    "memUsed": s.memoryUsedBytes,
                }
                for s in (p.stateOperators or [])
            ]
            progress.append(
                {
                    "name": p.name,
                    "batchId": p.batchId,
                    "rows": p.numInputRows,
                    "durationMs": dict(p.durationMs or {}),
                    "state": ops,
                }
            )

        def onQueryTerminated(self, event):
            pass

        def onQueryIdle(self, event):
            pass

    spark.streams.addListener(Rec())

    out: dict = {}
    for gate in ("streaming_asof_exact", "streaming_asof_joins_exact"):
        fn = queries()[gate]
        walls, batches = [], []
        for i in range(runs):
            n0 = len(progress)
            t0 = time.time()
            fn(spark, sf_dir).count()
            walls.append(round(time.time() - t0, 3))
            batches.append(progress[n0:])
        out[gate] = {
            "walls": walls,
            "batch_counts": [len(b) for b in batches],
            "runs": [
                [
                    {
                        "batchId": b["batchId"],
                        "rows": b["rows"],
                        "trigger_ms": b["durationMs"].get(
                            "triggerExecution"
                        ),
                        "addBatch_ms": b["durationMs"].get("addBatch"),
                        "commit_ms": sum(
                            s["commitMs"] for s in b["state"]
                        ) if b["state"] else None,
                        "state_rows": sum(
                            s["rowsTotal"] for s in b["state"]
                        ) if b["state"] else None,
                    }
                    for b in bl
                ]
                for bl in batches
            ],
        }
        print(json.dumps({gate: out[gate]["walls"],
                          "batch_counts": out[gate]["batch_counts"]}),
              flush=True)
    with open("/tmp/probe_streaming_asof.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"detail": "/tmp/probe_streaming_asof.json"}))


if __name__ == "__main__":
    main()
