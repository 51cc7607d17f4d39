"""The full near-duplicate detection + clustering pipeline (SURVEY.md §7,
BASELINE.json north_star) — the distributed generalization of the
reference's single pass (main.c:110-183):

  identity → route → exact dedup → signatures → LSH ∪ SimHash candidates →
  verify → containment → connected components → representative election →
  survivors + cluster map + lineage + metrics.

Scale shape:
  * ``content`` is touched by exactly three stages (signature UDF, exact
    containment verify, final survivor join); every wide shuffle carries
    (uid, hashes, signature) only — SURVEY.md §4's shuffle-volume rule.
  * near-dup stages run on exact-dedup representatives, not raw rows: at
    web scale exact dups are the bulk of the mass and collapse first
    (reference rule D1 runs before everything else for the same reason).
  * the expensive shared nodes (signatures, edges) are materialized EAGERLY
    before their consumers fan out. Spark's block cache does not dedupe
    concurrent computation of a not-yet-populated cached plan inside one
    job — profiled r02: letting survivors.count() trigger the whole DAG ran
    the Arrow signature stage several times concurrently, 64 s vs 31 s for
    the staged edges build at 32 cores.
  * candidate generation fuses the LSH band sweep and the SimHash block
    sweep into ONE bucket-pair pass (operators/lsh.fused_candidate_pairs) —
    the stage was barrier-bound, not compute-bound.
  * each stage is checkpointable (plans/checkpoint.py, keyed by config hash
    AND an input fingerprint) and contributes a metrics row; lineage records
    why every dropped row died — the distributed replacement for the
    reference's per-file counters (pfb_dnsbl_prune.py:233-241).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dedup_domains_spark.config import DedupConfig
from dedup_domains_spark.operators.connected_components import connected_components
from dedup_domains_spark.operators.containment import contained_pairs
from dedup_domains_spark.operators.exact_dedup import exact_dedup
from dedup_domains_spark.operators.lsh import fused_candidate_pairs
from dedup_domains_spark.operators.representative import elect_representatives
from dedup_domains_spark.operators.verify import verify_pairs_estimate, verify_pairs_exact
from dedup_domains_spark.functions.signatures import add_signatures
from dedup_domains_spark.plans.checkpoint import CheckpointContext
from dedup_domains_spark.sources.code_corpus import with_row_identity


@dataclass
class PipelineResult:
    """Pipeline outputs. The DIAGNOSTIC frames (lineage, metrics,
    partition_stats) are built lazily on first attribute access: every
    classic-mode DataFrame operation pays eager JVM analysis of its plan
    tree, and building these three (~20 operations over the pipeline's
    large cached plans) cost measurable driver wall in callers that only
    consume survivors/cluster_map — the bench legs and the headline query
    among them (r06; guide §7.3 driver-side planning). Values are
    identical — only construction time moves to the first consumer."""

    survivors: DataFrame     # representative rows + passthrough (full columns)
    cluster_map: DataFrame   # uid, cluster_id, rep_uid, is_rep, electable
    edges: DataFrame         # id_a, id_b, edge_kind — the duplicate graph
    _lineage_fn: Callable[[], DataFrame] = None    # uid, action, reason
    _metrics_fn: Callable[[], DataFrame] = None    # stage, count
    _partition_stats_fn: Callable[[], DataFrame] = None
    sig_df: DataFrame | None = None

    @property
    def lineage(self) -> DataFrame:
        if "_lineage" not in self.__dict__:
            self.__dict__["_lineage"] = self._lineage_fn()
        return self.__dict__["_lineage"]

    @property
    def metrics(self) -> DataFrame:
        if "_metrics" not in self.__dict__:
            self.__dict__["_metrics"] = self._metrics_fn()
        return self.__dict__["_metrics"]

    @property
    def partition_stats(self) -> DataFrame:
        if "_pstats" not in self.__dict__:
            self.__dict__["_pstats"] = self._partition_stats_fn()
        return self.__dict__["_pstats"]


def _partition_stats(stages: dict[str, DataFrame]) -> DataFrame:
    """Per-partition row counts for the named stage DataFrames — the skew
    diagnostic ('per-partition lineage and metrics', BASELINE.json). A
    partition holding >> rows/n_partitions pinpoints a hot key (mega-bucket,
    boilerplate shingle) before it blows an executor at real scale. Lazy:
    nothing is computed until the caller evaluates it."""
    parts = [
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .select(F.lit(name).alias("stage"), "partition_id", "rows")
        for name, df in stages.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def run_pipeline(
    spark: SparkSession,
    corpus: DataFrame,
    cfg: DedupConfig | None = None,
    passthrough_predicate: str = "lang = 'binary'",
    checkpoint_dir: str | None = None,
    stage_times: dict | None = None,
) -> PipelineResult:
    """stage_times: PROBE MODE ONLY — when a dict is passed, every stage is
    materialized eagerly with a count() barrier and its wall recorded under
    its name. This SERIALIZES stages that normally overlap inside one job
    (candidates/verify vs containment), so probe walls are comparable
    leg-to-leg but NOT to the production wall. Used by tools/stage_probe.py
    to locate which stage loses scaling efficiency between cluster sizes."""
    cfg = cfg or DedupConfig()

    def _mark(name: str, df: DataFrame | None = None) -> None:
        if stage_times is None:
            return
        import time as _time

        t0 = _time.time()
        if df is not None:
            df.count()
        stage_times[name] = round(_time.time() - t0, 2)
    ckpt = CheckpointContext(
        spark, checkpoint_dir, cfg.config_hash(),
        input_fingerprint=f"{corpus.semanticHash() & 0xFFFFFFFF:08x}",
    )
    # AQE re-plans at every exchange — a driver barrier the pipeline doesn't
    # need (skew handled explicitly; see DedupConfig.use_aqe). The heavy
    # stages run eagerly inside this function under the pipeline setting;
    # the session value is restored before returning so ad-hoc queries keep
    # their AQE behavior.
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", str(cfg.use_aqe).lower())

    # ---- identity + route (F2 analog: carry-over rows bypass dedup) ----
    df = with_row_identity(corpus)
    df = ckpt.stage(df, "identity").cache()
    passthrough = df.filter(F.expr(passthrough_predicate))
    dedupable = df.filter(~F.expr(passthrough_predicate))

    # ---- D1: exact dedup on content_sha256 ----
    exact = exact_dedup(dedupable)
    exact_map = ckpt.stage(exact.cluster_map, "exact_map").cache()
    # repartition BEFORE caching: the semi-join is usually a broadcast join,
    # which preserves the scan's partitioning — and a scan over few/large
    # row groups is arbitrarily unbalanced (a single-row-group file = ONE
    # fat partition). Every content consumer (signature UDF, exact verify,
    # containment) reads this cache, so balance it once here and the full
    # content column shuffles exactly once in the whole pipeline.
    exact_reps = dedupable.join(
        exact_map.filter("is_rep").select("uid"), "uid", "leftsemi"
    ).repartition(spark.sparkContext.defaultParallelism * 2).cache()
    _mark("exact", exact_reps)

    # ---- signatures on exact representatives only ----
    sig_df = add_signatures(
        exact_reps.select("uid", "content"), cfg, repartition=0
    ).select("uid", "n_tokens", "n_shingles", "minhash", "simhash", "probes")
    sig_df = ckpt.stage(sig_df, "signatures").cache()
    _mark("signatures", sig_df)
    # eager: four consumers fan out from sig_df (bands, blocks, verify twice,
    # containment probes) — materialize once, linearly, before they race.
    # When the containment scan path will need the probe set anyway, its
    # collection IS the materializing action (it scans every sig_df
    # partition, collect_probe_filter) — one driver barrier instead of two.
    probe_filter = None
    if cfg.containment_verify == "scan" and cfg.containment_broadcast_probes:
        from dedup_domains_spark.operators.containment import collect_probe_filter

        probe_filter = collect_probe_filter(sig_df, cfg)
    else:
        sig_df.count()

    # ---- candidate generation: fused LSH bands ∪ SimHash blocks ----
    candidates = fused_candidate_pairs(sig_df, cfg)
    candidates = ckpt.stage(candidates, "candidates")
    if stage_times is not None:
        candidates = candidates.cache()
        _mark("candidates", candidates)

    # ---- verification ----
    if cfg.use_exact_jaccard:
        near = verify_pairs_exact(candidates, exact_reps, cfg)
    else:
        near = verify_pairs_estimate(candidates, sig_df, cfg)
    near = ckpt.stage(near.select("id_a", "id_b"), "near_pairs")
    if stage_times is not None:
        near = near.cache()
        _mark("verify", near)

    # ---- D2 analog: exact-substring containment ----
    spill_caches: list = []  # interim persists released after CC-init runs
    if cfg.containment_verify == "suffix_array":
        from dedup_domains_spark.operators.suffix_array import suffix_contained_pairs

        contained = suffix_contained_pairs(exact_reps, sig_df, cfg)
    else:
        # repartition=0: exact_reps is already balanced (repartitioned at
        # creation above) — skip the operator's defensive content shuffle.
        # spill hand-off: the postings DISK_ONLY cache is released right
        # after CC's init job materializes the edge DAG (VERDICT r03 item 4)
        # — NOT via eager mode, which would materialize the containment
        # branch synchronously and forfeit its concurrency with the
        # candidates/verify stages inside that job (measured 42 -> 81 s at
        # 240k rows when serialized).
        contained = contained_pairs(exact_reps, sig_df, cfg, repartition=0,
                                    spill=spill_caches,
                                    probe_filter=probe_filter)
    contained = ckpt.stage(contained, "contained_pairs").cache()
    _mark("containment", contained)

    # ---- edge union: near + containment + exact-dup membership ----
    exact_edges = (
        exact_map.filter(~F.col("is_rep"))
        .select(F.col("rep_uid").alias("id_a"), F.col("uid").alias("id_b"))
    )
    edges = (
        near.withColumn("edge_kind", F.lit("near"))
        .unionByName(
            contained.select(
                F.col("small_id").alias("id_a"), F.col("big_id").alias("id_b")
            ).withColumn("edge_kind", F.lit("contained"))
        )
        .unionByName(exact_edges.withColumn("edge_kind", F.lit("exact")))
    )
    edges = ckpt.stage(edges, "edges").cache()
    # no edges.count() barrier here (VERDICT r03 item 3): connected_components
    # builds its adjacency with a SINGLE scan of edges, so its labels-init
    # job is a linear materializer for this cache — metrics and electability
    # read the populated blocks afterwards. (The old count() + CC-init pair
    # scanned the full upstream twice back-to-back.)

    # ---- connected components + singleton backfill ----
    if stage_times is not None:
        _mark("edges", edges)
    cc_stats: dict = {}
    if stage_times is not None:
        import time as _time

        _t_cc = _time.time()
    try:
        labels = connected_components(
            edges.select("id_a", "id_b"), max_iterations=cfg.cc_max_iterations,
            stats=cc_stats, durable=checkpoint_dir is not None,
        )
    finally:
        # CC's init job has materialized the full edge DAG (contained is
        # cached now) — the containment postings spill is no longer reachable
        for c in spill_caches:
            c.unpersist()
    if stage_times is not None:
        stage_times["cc"] = round(_time.time() - _t_cc, 2)
        stage_times["cc_iterations"] = cc_stats.get("iterations", 0)
    singletons = (
        dedupable.select("uid")
        .join(labels.select("uid"), "uid", "leftanti")
        .withColumn("cluster_id", F.col("uid"))
    )
    all_labels = labels.unionByName(singletons)
    all_labels = ckpt.stage(all_labels, "clusters").cache()

    # ---- electability: any copy of contained content cannot represent ----
    contained_reps = contained.select(F.col("small_id").alias("rep_uid")).distinct()
    non_electable = exact_map.join(contained_reps, "rep_uid", "leftsemi").select("uid")
    members = (
        all_labels.join(
            dedupable.select("uid", "repo", "path", "commit"), "uid", "inner"
        )
        .join(non_electable.withColumn("_ne", F.lit(True)), "uid", "left")
        .withColumn("electable", F.coalesce(~F.col("_ne"), F.lit(True)))
        .drop("_ne")
    )

    elected = elect_representatives(members)
    cluster_map = ckpt.stage(
        elected.select("uid", "cluster_id", "rep_uid", "is_rep", "electable"),
        "cluster_map",
    ).cache()
    _mark("cluster_map", cluster_map)

    # ---- survivors: cluster representatives + passthrough carry-over ----
    survivors = (
        df.join(cluster_map.filter("is_rep").select("uid"), "uid", "leftsemi")
        .unionByName(passthrough)
    )
    survivors = ckpt.stage(survivors, "survivors")

    # ---- lineage / metrics / partition_stats: LAZY (see PipelineResult —
    # these ~20 DataFrame operations over large cached plans are eager JVM
    # analysis the survivors-only callers never need) ----
    def _lineage() -> DataFrame:
        # why every row lived or died (M1 analog)
        return (
            cluster_map.withColumn(
                "action",
                F.when(F.col("is_rep"), F.lit("kept_representative"))
                .when(~F.col("electable"), F.lit("dropped_contained"))
                .otherwise(F.lit("dropped_duplicate")),
            ).select("uid", "cluster_id", "rep_uid", "action")
            .unionByName(
                passthrough.select(
                    "uid",
                    F.col("uid").alias("cluster_id"),
                    F.col("uid").alias("rep_uid"),
                    F.lit("passthrough").alias("action"),
                )
            )
        )

    def _metrics() -> DataFrame:
        # three single-pass aggregations over cached frames (the r01
        # version rescanned via nine unioned groupBy-counts, VERDICT item 3)
        is_pt = F.expr(passthrough_predicate).cast("long")
        base = df.agg(
            F.count(F.lit(1)).alias("_input"), F.sum(is_pt).alias("_pt")
        )
        cm = cluster_map.agg(
            F.sum(F.col("is_rep").cast("long")).alias("_clusters")
        )
        reps = exact_map.agg(F.sum(F.col("is_rep").cast("long")).alias("_reps"))
        onerow = base.crossJoin(cm).crossJoin(reps)
        return onerow.selectExpr(
            "stack(6, 'input', _input, 'passthrough', _pt, "
            "'dedupable', _input - _pt, 'exact_reps', _reps, "
            "'clusters', _clusters, 'survivors', _clusters + _pt) as (stage, count)"
        ).unionByName(
            edges.groupBy(
                F.concat(F.lit("edges_"), F.col("edge_kind")).alias("stage")
            ).count()
        ).unionByName(
            spark.createDataFrame(
                [("cc_iterations", cc_stats.get("iterations", 0))],
                "stage string, count long",
            )
        )

    spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    return PipelineResult(
        survivors=survivors,
        cluster_map=cluster_map,
        edges=edges,
        _lineage_fn=_lineage,
        _metrics_fn=_metrics,
        _partition_stats_fn=lambda: _partition_stats(
            {"signatures": sig_df, "edges": edges, "cluster_map": cluster_map}
        ),
        sig_df=sig_df,
    )


def assert_sha_invariant(result: PipelineResult) -> int:
    """Every surviving record's content hashes to its recorded sha256
    (BASELINE.json per-row invariant). Returns violation count (must be 0)."""
    return result.survivors.filter(
        F.sha2(F.col("content"), 256) != F.col("content_sha256")
    ).count()
