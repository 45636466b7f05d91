"""entity_linking_spark — a from-scratch PySpark-native record-linkage engine.

Re-expresses the capabilities of the reference Wikipedia entity-linking
system (marinaho/Entity-Linking, a 2013 Java/Hadoop-MapReduce codebase) as an
idiomatic Spark DataFrame pipeline over tables of multi-turn
conversation/agent transcripts:

    stage 0  ingest + normalize        (reference: normalizer/Normalizer.java)
    stage 1  blocking / candidate gen  (reference: md/MentionDetection.java,
                                        index/MentionIndex.java)
    stage 2  pairwise scoring          (reference: loopybeliefpropagation/*,
                                        baseline/RandomGraphWalk.java)
    stage 3  transitive clustering     (reference: JUNG WeakComponentClusterer,
                                        baseline/RandomGraphWalk.java:340-346)

plus the training-data-pipeline operators a 100 TB corpus needs (dedup,
similarity search, text analysis, multimodal plumbing).

Everything is DataFrame/SQL-first: Catalyst handles pushdown/pruning/join
strategy; Python only appears as Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"
