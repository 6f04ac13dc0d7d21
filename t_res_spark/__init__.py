"""t_res_spark — a PySpark-native entity-resolution (record-linkage) engine.

A from-scratch re-creation of the query/data-processing capabilities of
Living-with-machines/T-Res (toponym resolution: mention extraction →
fuzzy candidate ranking → disambiguation/linking), re-expressed as a
blocking + pairwise-scoring + transitive-clustering pipeline over tables
of multi-turn conversation/agent transcripts
(conv_id, turn_idx, role, text, tool, ts).

Architecture (Spark-first, not a port):

    transcripts ──mapInPandas──▶ mentions ──blocking──▶ (block_key, mention)
        ⋈ alias table (broadcast / shuffle-hash, salted on hot keys)
        ──batched pandas-UDF scoring (Damerau-Levenshtein / Jaro-Winkler /
          embedding cosine; exact-match short-circuit)──▶ candidates
        ──linking (most_popular agg / by_distance / rank_candidates as
          native column expressions)──▶ predictions
        ──edges──▶ iterative connected components (small-star/large-star)
        ──▶ clusters  (+ per-partition lineage/metrics, checkpointed)

Reference parity citations are given per-function as ``file:line`` into
/root/reference (read-only snapshot of the T-Res repository).
"""

__version__ = "0.1.0"
