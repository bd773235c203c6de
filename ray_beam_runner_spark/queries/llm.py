"""LLM-data-pipeline query coverage (SURVEY.md §7 step 9): deduplication,
similarity search, text analysis, multimodal plumbing. Filled in build
order; each query gets a DuckDB oracle where SQL can express the same
deterministic computation."""

from __future__ import annotations
