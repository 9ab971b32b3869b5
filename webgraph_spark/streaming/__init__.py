"""Incremental ingestion + warm-start analytics.

The reference is a static-snapshot engine — no streaming exists anywhere in
/root/reference (SURVEY §1.5: "incremental arrives only as checkpoint/resume
of iterations"). This package supplies the two incremental capabilities a
living corpus needs, Spark-natively:

- :mod:`ingest`: Structured Streaming over arriving arc files, merged into
  the canonical edge table exactly-once per micro-batch (foreachBatch +
  atomic publish — the streaming generalization of
  ``IncrementalImmutableSequentialGraph``'s push-style build,
  ``IncrementalImmutableSequentialGraph.java:54``).
- warm-start: every iterative job accepts ``initial_*`` state
  (pagerank/cc/lpa), so after a delta lands the fixpoint restarts from the
  previous converged state and terminates in far fewer iterations.
"""
