"""mpi_word_count_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
MPI word-count engine (Luigi-Crisci/MPI-Word-Count), built Spark-first:
DataFrame/SQL logical plans, Catalyst/Tungsten physical execution,
Structured Streaming for streams. Extended with the LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
required at 100 TB scale.

Reference semantics reproduced (see SURVEY.md §1.4):
  S1 tokenization  — maximal runs of non-delimiter chars
                     (reference: tokenizer.c:47-79)
  S2 case folding  — case-insensitive counting, lowercase output
                     (reference: hash_map.c:27-28)
  S3 aggregation   — per-word counts summed (reference: cell.c:13)
  S4 ordering      — ascending bytewise by word (reference: hash_map.c:101-132)
  S5 sinks         — CSV `Word,Count` / console (reference: word_count_mpi.c:132-142)
  S6 exactly-once  — split-boundary words counted once
                     (reference: word_count_mpi.c:285-322; Spark text source
                     gives the same guarantee per line record)
"""

from mpi_word_count_spark.session import get_spark
from mpi_word_count_spark.tokenizer import DEFAULT_DELIMITERS, delimiter_regex, tokenize

__all__ = ["get_spark", "DEFAULT_DELIMITERS", "delimiter_regex", "tokenize"]

__version__ = "0.1.0"
