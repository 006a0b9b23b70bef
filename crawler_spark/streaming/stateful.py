"""Custom stateful streaming operator: per-host circuit breaker.

The reference's anti-retry loop re-cleans and resubmits an ANTIED task up to
6 times and alerts on persistent anti-crawl hits (T8,
reference TaskWorker.java:238-261; P3 alert map ContentExtractor.java:62-80).
Streaming-first, that is arbitrary per-key state evolving as fetch results
arrive — exactly what ``applyInPandasWithState`` exists for: the host's
failure streak lives in the state store, survives across triggers via the
streaming checkpoint, and emits an updated (host, tripped) row per trigger.

Semantics per host, rows ordered by (round, rank, url):

* FAILED / ANTIED extend the consecutive-failure streak, anything else
  resets it
* ``tripped`` = the max streak ever reached ≥ threshold — the signal a real
  deployment would use to pause a host's politeness budget (the engine's
  batch rounds implement the same decision as T8 retry caps).

Ordering note: rows are sorted within each trigger; cross-trigger order
follows file-source discovery order, which is exact for the single-trigger
``availableNow`` drains the tests and driver use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["host_circuit_breaker", "BREAKER_OUT_SCHEMA"]

FAIL_STATUSES = ("FAILED", "ANTIED")
BREAKER_OUT_SCHEMA = (
    "host string, consec_fail int, max_streak int, tripped boolean, "
    "rows_seen bigint, last_round int"
)
_STATE_SCHEMA = "consec_fail int, max_streak int, rows_seen bigint, last_round int"


def host_circuit_breaker(log: DataFrame, threshold: int = 3) -> DataFrame:
    """fetch_log stream → one updated breaker row per host per trigger.

    State is (streak, max streak, rows seen, last round) — O(1) per host, so
    the state store stays tiny no matter how many URLs flow through (the
    100 TB-safe property: state size scales with hosts, not fetches).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        import pandas as pd

        if state.exists:
            consec, max_streak, rows_seen, last_round = state.get
        else:
            consec, max_streak, rows_seen, last_round = 0, 0, 0, -1
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["round", "rank", "url"], kind="mergesort")
        for status, rnd in zip(pdf["status"], pdf["round"]):
            if status in FAIL_STATUSES:
                consec += 1
                max_streak = max(max_streak, consec)
            else:
                consec = 0
            last_round = max(last_round, int(rnd))
        rows_seen += len(pdf)
        state.update((int(consec), int(max_streak), int(rows_seen), int(last_round)))
        yield pd.DataFrame(
            [
                {
                    "host": key[0],
                    "consec_fail": int(consec),
                    "max_streak": int(max_streak),
                    "tripped": bool(max_streak >= threshold),
                    "rows_seen": int(rows_seen),
                    "last_round": int(last_round),
                }
            ]
        )

    return log.groupBy("host").applyInPandasWithState(
        update,
        outputStructType=BREAKER_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
