from dedup_domains_spark.streaming.dedup_stream import (
    stream_band_dedup,
    stream_exact_dedup,
    stream_signatures,
)

__all__ = ["stream_exact_dedup", "stream_signatures", "stream_band_dedup"]
