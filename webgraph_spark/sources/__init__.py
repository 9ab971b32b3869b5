"""Sources/sinks: corpus synthesis, edge derivation, text graph formats, id compaction.

Reference counterparts: the text-format loaders (``ASCIIGraph.java``,
``ArcListASCIIGraph.java``, ``ScatteredArcsASCIIGraph.java``) and the id
compaction map (``ScatteredArcsASCIIGraph.java:149`` ``Id2NodeMap``).
"""
