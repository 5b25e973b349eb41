"""The reference's documented SQL query surface (SURVEY.md §2B) mapped to
the driver's synthetic tables: ``events`` plays the role of ``logs``
(ts=time, props=JSONB data, user_id=correlation key, event_type=message),
``customer`` plays ``context``, order/ship-date windows play ``span``.

Populated incrementally; see git history.
"""

from __future__ import annotations
