"""Oracle SQL fragments shared across query modules.

A semantic rule that two oracles both depend on (session gap,
range-join predicate) must live in ONE string, so an edit can never
leave a twin silently inconsistent — extracted after a round-6 review
found the gaps-and-islands CTE and the range-join oracle duplicated
verbatim (q_stream_session / q_join_interval, q_join_range /
stream_stream_join).
"""

from __future__ import annotations

# Gaps-and-islands session assignment over events: a new session starts
# after >10 minutes of per-user inactivity; (ts, event_id) is the total
# order, so tie rows can never flip sessions between engines. Consumers
# append their own aggregate over `numbered` (grouping by user_id, sid);
# Spark's session_window end = last event + gap.
SESSION_GAP_MINUTES = 10

SESSION_ISLANDS_CTE = f"""flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MINUTES} minutes
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts, event_id, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )"""

# Interval/range join: click within 5 minutes after a view by the same
# user — the oracle of BOTH the batch key (q_join_range) and its
# streaming replay (stream_stream_join), which must stay hash-twins.
RANGE_JOIN_ORACLE = """
    SELECT v.event_id AS view_id, k.event_id AS click_id, v.user_id,
           CAST(date_diff('microsecond', v.ts, k.ts) AS BIGINT) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    JOIN (SELECT * FROM events WHERE event_type = 'click') k
      ON v.user_id = k.user_id
     AND k.ts > v.ts AND k.ts <= v.ts + INTERVAL 5 MINUTE
    """
