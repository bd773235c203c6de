"""LLM-data-pipeline operators (SURVEY.md §7 step 9): text analysis,
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding
similarity search, multimodal column plumbing.

All operators are DataFrame→DataFrame, built from JVM-side expressions
(whole-stage codegen) wherever possible; pandas UDFs appear only where
Python is genuinely required (multimodal decode). No driver-side collects —
every op is safe at 100 TB."""
