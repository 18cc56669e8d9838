"""nil_spark — a PySpark-native inverted-index + BM25 full-text engine.

A from-scratch Spark re-expression of the query/data-processing
capabilities of the NIL clone detector (FSE'21, reference snapshot at
/root/reference): tokenize -> n-gram shingles -> partitioned posting
lists -> candidate location via posting intersection -> cheap overlap
filtration -> LCS verification — generalized to BM25 top-k search over
multi-turn transcript tables, plus the training-data-pipeline operators
(dedup, ANN, text analysis) a 100 TB corpus needs.

Everything is DataFrame-first: Catalyst plans the scans/joins/aggs;
Arrow pandas UDFs are used only where built-ins cannot express the
semantics (tokenization, varint segment codecs, LCS verification).
"""

from nil_spark.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"
