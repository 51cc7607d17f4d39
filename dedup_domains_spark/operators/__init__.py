from dedup_domains_spark.operators.domain_mode import DomainModeResult, dedup_dnsbl
from dedup_domains_spark.operators.exact_dedup import exact_dedup

__all__ = ["dedup_dnsbl", "DomainModeResult", "exact_dedup"]
