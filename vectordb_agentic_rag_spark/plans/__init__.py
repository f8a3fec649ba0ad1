"""End-to-end pipeline plans: the reference's three entry points
(SURVEY.md §3) as one batch-native facade."""

from .pipeline import RagPipeline  # noqa: F401
