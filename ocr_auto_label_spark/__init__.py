"""ocr_auto_label_spark — a from-scratch PySpark-native extraction engine.

Re-expresses the data semantics of the reference repo
``raccoman-data/ocr-auto-label`` (a Node/SQLite photo auto-labeler) as an
idiomatic Spark pipeline over multi-turn conversation/agent transcript
tables ``(conv_id, turn_idx, role, text, tool, ts)``:

- ``labelcore``  — pure-Python extraction core (grammar validation,
  character-confusion correction, canonical fuzzy match, confidence
  scoring).  Zero Spark imports; it is both the pytest oracle and the
  body of the Arrow-vectorized pandas UDFs.
- ``functions``  — pandas UDFs + column-expression builders.
- ``operators``  — relational operators (windows, range joins, dedup,
  similarity search, text stats).
- ``plans``      — end-to-end pipelines (salted repartition, lineage,
  resume-from-checkpoint).
- ``datagen``    — deterministic synthetic transcript generator.
"""

__version__ = "0.1.0"
