"""Operational alerting — the reference's README-promised (but never
implemented) failure alerts, made real.

The reference's fetch README describes email alerts on pipeline failure
(data_fetch_system/README.md:332-336) while shipping no code for them
(the referenced test.py does not exist). Here the rule evaluation and
the delivery hook are real and tested; the TRANSPORT is pluggable — the
default appends JSONL to an alert log (the artifact an on-call pager or
mail relay tails), and production injects `transport=callable` for
SMTP/webhook/etc. No network dependency lives in this module.

Rule evaluation is driver-side over ALREADY-AGGREGATED relations (a
handful of rows: per-batch counters, dead-letter totals), never over
fact tables — alerts are metadata-sized at any corpus scale.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class AlertRule:
    """Threshold rule over a 1-row metrics relation."""

    name: str
    metric: str
    # fires when metric value compares true against threshold
    op: str  # ">" | ">=" | "<" | "<=" | "=="
    threshold: float
    severity: str = "warning"


_OPS: dict[str, Callable[[float, float], bool]] = {
    ">": lambda v, t: v > t,
    ">=": lambda v, t: v >= t,
    "<": lambda v, t: v < t,
    "<=": lambda v, t: v <= t,
    "==": lambda v, t: v == t,
}


def evaluate_alerts(metrics: dict[str, float],
                    rules: list[AlertRule],
                    context: dict | None = None) -> list[dict]:
    """Evaluate rules against a metrics dict; return alert records."""
    alerts = []
    for rule in rules:
        if rule.metric not in metrics:
            continue
        value = float(metrics[rule.metric])
        if _OPS[rule.op](value, rule.threshold):
            alerts.append({
                "alert": rule.name,
                "severity": rule.severity,
                "metric": rule.metric,
                "value": value,
                "op": rule.op,
                "threshold": rule.threshold,
                **(context or {}),
            })
    return alerts


def dead_letter_metrics(accepted: DataFrame, dead: DataFrame) -> dict:
    """Counter metrics for the quality-gate alert rules (xs11/T7
    family): totals plus the dead-letter fraction."""
    n_ok = accepted.count()
    n_dead = dead.count()
    total = n_ok + n_dead
    return {
        "n_accepted": n_ok,
        "n_dead_lettered": n_dead,
        "dead_letter_rate": (n_dead / total) if total else 0.0,
    }


def default_rules() -> list[AlertRule]:
    return [
        AlertRule("dead_letter_rate_high", "dead_letter_rate", ">",
                  0.05, "warning"),
        AlertRule("all_records_rejected", "n_accepted", "==", 0,
                  "critical"),
    ]


def deliver(alerts: list[dict], path: str,
            transport: Callable[[dict], None] | None = None) -> int:
    """Deliver alerts: append JSONL to `path`, then hand each record to
    `transport` if injected (SMTP/webhook in production). Append-only,
    like the status audit log — no rewrite amplification."""
    if not alerts:
        return 0
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as fh:
        for record in alerts:
            fh.write(json.dumps(record, sort_keys=True) + "\n")
    if transport is not None:
        for record in alerts:
            transport(record)
    return len(alerts)
