"""Iterative graph analytics as driver-looped DataFrame jobs.

Reference counterparts live in ``src/it/unimi/dsi/webgraph/algo/``:
BFS (``ParallelBreadthFirstVisit.java``), connected components
(``ConnectedComponents.java``), HyperBall. PageRank, label propagation and
triangle counting are NOT in the reference (verified by grep); their
semantics follow the published algorithms, fixed deterministically
(min tie-breaks) so outputs are exactly reproducible.
"""
