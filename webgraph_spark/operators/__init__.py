"""Graph transforms (views) and labelled-graph algebra.

Reference counterparts: ``Transform.java`` (filter/map/transpose/symmetrize/
simplify/union/compose/line), ``ImmutableSubgraph.java``,
``labelling/LabelMergeStrategy.java``, ``labelling/LabelSemiring.java``.
All are lazy DataFrame expressions — Catalyst fuses them like the
reference's pull-style lazy views fuse during iteration.
"""
