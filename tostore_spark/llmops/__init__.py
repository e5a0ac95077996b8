"""LLM-data-pipeline operators: dedup, similarity search, text analysis,
multimodal columns.

These go beyond the reference's surface (SURVEY.md §7.2 step 11): the
operations a large-scale training-data pipeline needs, built DataFrame-native
for 100 TB — no driver-side collects, bounded shuffles, candidate generation
always via bucketing/LSH before any pairwise work.
"""

from tostore_spark.llmops import (dedup, dsir, lm, multimodal,  # noqa: F401
                                  paragraphs, search, similarity, text)
