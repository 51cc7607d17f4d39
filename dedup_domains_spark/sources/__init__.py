from dedup_domains_spark.sources.code_corpus import load_code_corpus, with_row_identity
from dedup_domains_spark.sources.dnsbl import DNSBL_SCHEMA, load_dnsbl_files

__all__ = ["load_code_corpus", "with_row_identity", "load_dnsbl_files", "DNSBL_SCHEMA"]
