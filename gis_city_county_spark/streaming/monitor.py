"""Streaming observability: turn a query's progress events into the
throughput/lag report an operator actually watches.

Structured Streaming already emits everything needed —
``StreamingQuery.recentProgress`` keeps the last ~100 micro-batch
progress events (input rows, per-stage durations, state-store rows)
— this module just reduces them to the three numbers that matter for
capacity planning:

* **throughput**: input rows per second of trigger wall-clock;
* **latency**: trigger duration (add + getBatch + process + commit);
* **state pressure**: state-store rows and memory, the quantity a
  stateful operator (sessionization, LSH buckets, count-min cells)
  must keep BOUNDED for the stream to run forever.

At scale this feeds the autoscaler/alerting path: rising trigger
duration at flat input rate means state or skew growth; rising state
rows under a watermark/TTL/`max_state` policy means the policy is
mis-sized (compare against the expected bound, e.g. depth × width
for the count-min twin, active-buckets × ``max_state`` for the LSH
dedup).
"""

from __future__ import annotations

from typing import Any


def batch_reports(query: Any) -> list[dict]:
    """One flat dict per micro-batch from ``query.recentProgress``
    (oldest first): batch id, input rows, trigger duration, rows/sec,
    and total state rows/memory across stateful operators."""
    out: list[dict] = []
    for p in query.recentProgress:
        dur_ms = (p.get("durationMs") or {}).get("triggerExecution")
        n_in = p.get("numInputRows", 0)
        state_rows = sum(
            (op.get("numRowsTotal") or 0) for op in p.get("stateOperators") or []
        )
        state_bytes = sum(
            (op.get("memoryUsedBytes") or 0) for op in p.get("stateOperators") or []
        )
        out.append(
            {
                "batch_id": p.get("batchId"),
                "input_rows": n_in,
                "trigger_ms": dur_ms,
                "rows_per_sec": (
                    (n_in * 1000.0 / dur_ms) if dur_ms else None
                ),
                "state_rows": state_rows,
                "state_bytes": state_bytes,
            }
        )
    return out


def summarize(query: Any) -> dict:
    """Roll the per-batch reports up to the numbers a dashboard pins:
    totals, peak trigger latency, and final state size (the value a
    boundedness assertion checks against the operator's designed
    cap)."""
    rows = batch_reports(query)
    data = [r for r in rows if r["input_rows"]]
    return {
        "n_batches": len(rows),
        "n_data_batches": len(data),
        "total_input_rows": sum(r["input_rows"] for r in rows),
        "max_trigger_ms": max(
            (r["trigger_ms"] for r in rows if r["trigger_ms"] is not None),
            default=None,
        ),
        "final_state_rows": rows[-1]["state_rows"] if rows else 0,
        "final_state_bytes": rows[-1]["state_bytes"] if rows else 0,
    }
