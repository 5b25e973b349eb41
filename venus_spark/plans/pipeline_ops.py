"""Training-data pipeline plans: dedup, similarity search, text analysis,
multimodal — over the ``documents`` and ``embeddings`` tables.

Populated incrementally; the heavy lifting lives in
:mod:`venus_spark.operators`.
"""

from __future__ import annotations
