"""Vector-similarity search over the embeddings table (the generalization of
the reference's cone cross-match, SURVEY.md J1).

Filled incrementally; see operators/similarity.py for the reusable builders."""

from __future__ import annotations
