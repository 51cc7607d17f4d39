"""dedup_domains_spark — a from-scratch, PySpark-native near-duplicate
detection and clustering engine with the query/data-processing capabilities of
babilon/dedup-domains (reference at /root/reference, see SURVEY.md).

The reference is a single-process C trie-walk deduplicator over DNS-blocklist
CSV feeds; this package re-expresses its semantics (exact-duplicate collapse,
parent-domain subsumption, strength-upgrade replacement, regex pass-through,
order-preserving survivor output — reference src/domaintree.c:259-375,
src/pfb_prune.c:166-211) as declarative Spark DataFrame pipelines, and
generalizes them to web-scale source-code dedup per BASELINE.json's north
star: content-sha256 exact dedup, MinHash/LSH + SimHash candidate generation,
substring containment, and iterative connected components.
"""

from dedup_domains_spark.config import DedupConfig
from dedup_domains_spark.session import get_spark

__all__ = ["DedupConfig", "get_spark"]
__version__ = "0.1.0"
