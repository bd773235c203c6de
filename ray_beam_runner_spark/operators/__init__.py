"""Engine operators (SURVEY.md §2): grouping, windowing, joins, set ops,
element-wise ParDo hosting, stateful processing.

Each module cites the reference implementation it provides parity with;
the code itself is idiomatic Spark (DataFrame expressions first, Arrow
pandas-UDFs only for opaque user logic)."""
