"""Streaming-shaped operators (SURVEY.md §2.10, T1-T7).

The reference's three polling loops (5-min replay detection, 60-s outbox
drain, 120-s clip poll — reference: check_replay_dag.py:17,
bot/botrun.py:242-291) are processing-time micro-batch consumers; here they
are Structured Streaming queries with ``availableNow``/``processingTime``
triggers, checkpointed cursors instead of Airflow Variables, and
``foreachBatch`` for the side-effecting sinks.
"""

from .cursor import incremental_after_cursor, seed_cursor
from .dedup import stream_dedup_counts
from .outbox import drain_outbox, make_outbox
from .suppression import suppress_alerts

__all__ = [
    "incremental_after_cursor",
    "seed_cursor",
    "stream_dedup_counts",
    "make_outbox",
    "drain_outbox",
    "suppress_alerts",
]
