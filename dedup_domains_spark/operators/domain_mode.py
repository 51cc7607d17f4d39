"""Reference-parity domain mode: the dedup semantics of babilon/dedup-domains
re-expressed as declarative DataFrame ops (no trie, no per-row Python).

Rules implemented (SURVEY.md §2.1), with reference citations:
  D1 exact-duplicate collapse — same domain, equal strength → first inserted
     wins (reference src/domaintree.c:259-294, strict '>' at :267).
  D2 parent-domain subsumption — a row whose domain is a strict descendant of
     any FULL-strength key is dropped (src/domaintree.c:330-339).
  D3 strength upgrade + retroactive subtree wipe — stronger row replaces
     weaker at the same key; a FULL insert kills the whole descendant subtree
     (src/domaintree.c:272-275). Order-independent final state.
  F2 type router — strength-2 regex rows bypass dedup and are carried over
     verbatim (src/pfb_prune.c:186-210).
  O1 order-restoring output — per file ascending line numbers, regex rows
     inline (src/pfb_prune.c:639-659).

Spark shape: the trie descent becomes (a) a window election per exact key and
(b) an ancestor-explode anti-join against the FULL-key set. Both are pure
Catalyst: whole-stage-codegen'd, shuffle on the domain / ancestor key, no
Python in the hot path. At 100 TB: the ancestor explode is a bounded fan-out
(avg label depth ~4), the FULL-key set is a fraction of the corpus and AQE
picks broadcast vs shuffle join at runtime.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class DomainModeResult:
    survivors: DataFrame   # full rows, output-ordered (file_order, linenumber)
    dropped: DataFrame     # rows removed, with a 'drop_reason' lineage column
    metrics: DataFrame     # stage -> count


def _ancestor_keys(labels_col):
    """Strict-ancestor domains of a label array: for a.b.x.com →
    [b.x.com, x.com, com]. Pure Catalyst (transform over sequence)."""
    n = F.size(labels_col)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(2), n),
            lambda i: F.array_join(F.slice(labels_col, i, n - i + 1), "."),
        ),
    ).otherwise(F.array().cast("array<string>"))


def dedup_dnsbl(df: DataFrame) -> DomainModeResult:
    """Run the full reference dedup over a dnsbl_lines DataFrame
    (schema: sources.dnsbl.DNSBL_SCHEMA).
    """
    df = df.cache()

    ignored = df.filter(F.col("valid") != "ok").withColumn(
        "drop_reason", F.concat(F.lit("ignored:"), F.col("valid"))
    )
    valid = df.filter(F.col("valid") == "ok")

    # F2: route regex rows around the dedup entirely.
    regex_rows = valid.filter(F.col("match_strength") == 2)
    dedupable = valid.filter(F.col("match_strength") < 2)

    # D1 + D3 (election half): per exact key, keep max strength; ties broken
    # by insertion order (file CLI order, then line number) — the
    # deterministic total order replacing the reference's sequential
    # first-wins (SURVEY.md §4 item 4).
    w = Window.partitionBy("domain").orderBy(
        F.col("match_strength").desc(), F.col("file_order").asc(),
        F.col("linenumber").asc(),
    )
    ranked = dedupable.withColumn("_rn", F.row_number().over(w))
    elected = ranked.filter(F.col("_rn") == 1).drop("_rn")
    exact_dropped = ranked.filter(F.col("_rn") > 1).drop("_rn").withColumn(
        "drop_reason", F.lit("exact_or_weaker_duplicate")
    )

    # D2 + D3 (wipe half): drop any elected row with a strict ancestor in the
    # FULL-key set. Covers both insertion orders at once — the reference's
    # eager drop (domaintree.c:330-339) and retroactive subtree wipe
    # (domaintree.c:272-275) have the same fixpoint.
    full_keys = (
        elected.filter(F.col("match_strength") == 1)
        .select(F.col("domain").alias("full_domain"))
    )
    labels = F.split(F.col("domain"), r"\.")
    with_anc = elected.withColumn("_anc", F.explode(_ancestor_keys(labels)))
    subsumed_ids = (
        with_anc.join(full_keys, with_anc["_anc"] == full_keys["full_domain"], "leftsemi")
        .select("file_order", "linenumber")
        .distinct()
    )
    subsumed = elected.join(subsumed_ids, ["file_order", "linenumber"], "leftsemi")\
        .withColumn("drop_reason", F.lit("subsumed_by_full_parent"))
    kept = elected.join(subsumed_ids, ["file_order", "linenumber"], "leftanti")

    # O1/A2: survivors ∪ carried-over regex rows, original order restored
    # (C semantics: regex rows inline at their line positions,
    # pfb_prune.c:639-659 + golden E2ETestRegexInput_2.fulle2e).
    survivors = kept.unionByName(regex_rows).orderBy("file_order", "linenumber")

    dropped = exact_dropped.unionByName(subsumed).unionByName(ignored)

    # M1: per-stage metrics (reference counters at pfb_dnsbl_prune.py:233-241).
    metrics = (
        df.select(F.lit("input").alias("stage"))
        .groupBy("stage").count()
        .unionByName(ignored.select(F.lit("ignored").alias("stage")).groupBy("stage").count())
        .unionByName(regex_rows.select(F.lit("regex_carry_over").alias("stage")).groupBy("stage").count())
        .unionByName(exact_dropped.select(F.lit("exact_dropped").alias("stage")).groupBy("stage").count())
        .unionByName(subsumed.select(F.lit("subsumed").alias("stage")).groupBy("stage").count())
        .unionByName(kept.select(F.lit("kept").alias("stage")).groupBy("stage").count())
    )
    return DomainModeResult(survivors=survivors, dropped=dropped, metrics=metrics)


def write_survivor_files(result: DomainModeResult, out_dir: str) -> dict[str, list[str]]:
    """Materialize per-source-file survivor line lists (the reference's O2
    merge-skip sink, pfb_prune.c:666-728: output = surviving raw lines,
    byte-identical, ascending line order). Returns {source_file: [raw_line]}.

    Driver-side collect is fine for fixture-scale parity checks; the scale
    path is ``survivors.write.partitionBy('source_file')``.
    """
    rows = (
        result.survivors.select("source_file", "linenumber", "raw_line")
        .orderBy("source_file", "linenumber")
        .collect()
    )
    out: dict[str, list[str]] = {}
    for r in rows:
        out.setdefault(r.source_file, []).append(r.raw_line)
    return out
