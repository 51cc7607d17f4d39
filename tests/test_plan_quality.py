"""Physical-plan audits — the 100 TB guardrails (SURVEY.md §4).

These tests read `.explain("formatted")` output and pin the properties that
matter at scale: filters reach the parquet scan (PushedFilters), projections
prune columns (ReadSchema), small dims broadcast, and the signature stage
keeps its explicit repartition (AQE must not serialize it).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .select("l_returnflag", "l_quantity")
    )
    plan = _formatted(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan, plan


def test_column_pruning_in_read_schema(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey")
    plan = _formatted(df)
    # scan must read exactly the projected column, not all 11
    assert "ReadSchema: struct<l_orderkey:bigint>" in plan, plan


def test_dim_join_broadcasts(spark):
    from dedup_domains_spark.plans.queries import QUERIES

    df = QUERIES["nation_revenue_join"].spark_fn(spark, SF)
    plan = _formatted(df)
    assert "BroadcastHashJoin" in plan, plan


def test_signature_stage_repartitions(spark):
    from dedup_domains_spark.config import DedupConfig
    from dedup_domains_spark.functions.signatures import add_signatures

    df = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").alias("uid"), F.col("text").alias("content")
    )
    sig = add_signatures(df, DedupConfig())
    plan = _formatted(sig)
    # explicit fan-out Exchange feeding the Arrow UDF
    assert "ArrowEvalPython" in plan, plan
    assert "RoundRobinPartitioning" in plan, plan


def test_containment_probe_side_broadcasts(spark):
    from dedup_domains_spark.config import DedupConfig
    from dedup_domains_spark.functions.signatures import add_signatures
    from dedup_domains_spark.operators.containment import containment_candidates
    from dedup_domains_spark.sources.code_corpus import with_row_identity

    cfg = DedupConfig()
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("source").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.md5("text").alias("commit"),
        "lang",
        F.col("text").alias("content"),
    )
    df = with_row_identity(docs)
    sig = add_signatures(df.select("uid", "content"), cfg)
    cand = containment_candidates(df, sig, cfg)
    plan = _formatted(cand)
    # probes broadcast; postings (the huge side) must not appear under an
    # Exchange hashpartitioning on 'shingle'
    assert "BroadcastHashJoin" in plan, plan


def test_containment_eager_releases_postings_spill(spark):
    """eager=True must leave NO retained DISK_ONLY blocks once the candidate
    set is materialized (VERDICT r03 item 4: the postings persist previously
    outlived the query — fine once per session, an accumulating spill in a
    recurring incremental loop)."""
    from dedup_domains_spark.config import DedupConfig
    from dedup_domains_spark.functions.signatures import add_signatures
    from dedup_domains_spark.operators.containment import contained_pairs
    from dedup_domains_spark.sources.code_corpus import with_row_identity

    cfg = DedupConfig()
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("source").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.md5("text").alias("commit"),
        "lang",
        F.col("text").alias("content"),
    )
    def _disk_only_ids():
        return {
            info.id()
            for info in spark.sparkContext._jsc.sc().getRDDStorageInfo()
            if info.storageLevel().useDisk()
            and not info.storageLevel().useMemory()
        }

    before = _disk_only_ids()  # session is shared — other tests may cache
    df = with_row_identity(docs)
    sig = add_signatures(df.select("uid", "content"), cfg)
    contained_pairs(df, sig, cfg, eager=True).count()
    leaked = _disk_only_ids() - before
    assert leaked == set(), f"retained DISK_ONLY blocks: {leaked}"


def test_udf_fanout_queries_materialize_signatures(spark):
    """The UDF-heavy catalog queries materialize their signature table at
    construction (plans/queries._materialize): their FINAL plan must carry
    zero ArrowEvalPython nodes — if the UDF reappears in the returned plan,
    a branch re-derived signatures from source and the 3-4x concurrent
    recompute (block cache does not dedupe in-flight work) is back.

    containment_probe_pairs is excluded: its plan legitimately carries ONE
    ArrowEvalPython — the postings shingle-explode over content, a separate
    single-pass UDF behind the DISK_ONLY postings persist — so a zero-node
    assertion can't distinguish that from a signature leak."""
    from dedup_domains_spark.plans.queries import QUERIES

    for name in ("minhash_lsh_pairs", "simhash_pairs"):
        plan = _formatted(QUERIES[name].spark_fn(spark, SF))
        assert "ArrowEvalPython" not in plan, (
            f"{name}: signature UDF leaked into the final plan — "
            f"fan-out node no longer materialized"
        )


def test_pipeline_job_budget(spark):
    """Pin the pipeline's Spark-job count — every job boundary is a driver
    barrier a 1000-executor cluster pays at full fan-in, and the r04 barrier
    diet (single-scan CC adjacency, no separate edges.count, round-1
    convergence probe skipped) is exactly the kind of property a refactor
    silently regresses. Job count is deterministic for a seeded corpus and
    fixed config (timing is not), so an exact upper bound is assertable.

    The CC fixpoint loop contributes ONE job per iteration (round 6: the
    lazily-truncated label table is materialized BY the convergence count,
    so checkpoint + probe share a job — r05 paid 2/iteration), and
    iteration count depends on the duplicate graph's diameter —
    corpus-size-dependent — so the budget is iteration-aware: BASE covers
    everything outside the loop (22 measured post-diet:
    identity/exact/signature-materialization — the probe collection
    doubling as the sig materializer — the CC labels-init scan that
    doubles as the edges materializer, election, survivors, cluster_map)
    plus 1 x cc_iterations, plus 2 headroom for Spark scheduling
    differences. If this fails after an intentional change, re-measure and
    move BASE WITH a BENCH.md note."""
    from dedup_domains_spark.config import DedupConfig
    from dedup_domains_spark.datagen import gen_code_corpus
    from dedup_domains_spark.plans.pipeline import run_pipeline

    sc = spark.sparkContext
    files = spark.createDataFrame(gen_code_corpus(2000).files)
    sc.setJobGroup("pipeline-job-budget", "barrier-diet regression audit")
    try:
        res = run_pipeline(spark, files, DedupConfig())
        res.survivors.count()
        res.cluster_map.count()
    finally:
        sc._jsc.clearJobGroup()
    jobs = sc.statusTracker().getJobIdsForGroup("pipeline-job-budget")
    # metrics.collect() runs OUTSIDE the job group — reading the iteration
    # count must not inflate the number it calibrates
    cc_iters = {r["stage"]: r["count"] for r in res.metrics.collect()}[
        "cc_iterations"
    ]
    budget = 22 + cc_iters + 2
    assert 0 < len(jobs) <= budget, (
        f"pipeline ran {len(jobs)} jobs at cc_iterations={cc_iters} — "
        f"barrier diet regressed (budget {budget} = 22 base + "
        f"1x{cc_iters} CC rounds + 2 headroom); job ids: {sorted(jobs)}"
    )


def test_bucketed_corpus_table_elides_join_shuffle(spark, tmp_path):
    """save_corpus_table writes the input_hint-shaped table bucketed by repo;
    a repo-keyed self-join of the catalog table must plan with NO Exchange
    (bucket join) — the layout the repo-granularity operators rely on at
    10^12 files."""
    from dedup_domains_spark.sources.code_corpus import (
        load_code_corpus, save_corpus_table,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("source").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.md5("text").alias("commit"),
        "lang",
        F.col("text").alias("content"),
    )
    save_corpus_table(docs, "corpus_bucketed", buckets=8,
                      location=str(tmp_path / "corpus_bucketed"))
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        tbl = load_code_corpus(spark, "corpus_bucketed")
        assert tbl.count() == docs.count()
        assert tbl.columns == ["repo", "path", "commit", "lang", "content"]
        # force the sort-merge path (a broadcast of the small test agg is
        # also shuffle-free, but the bucket-layout claim is about the
        # big-by-big case where broadcast is impossible)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        agg = tbl.groupBy("repo").count()
        joined = tbl.select("repo", "path").join(agg, "repo")
        plan = _formatted(joined)
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS corpus_bucketed")


def test_embedding_near_dup_no_cartesian(spark):
    """The bucketed embedding near-dup path must never degrade to an O(n²)
    cartesian/nested-loop join (VERDICT r01 item 2)."""
    from dedup_domains_spark.plans.queries import QUERIES

    df = QUERIES["embedding_near_dup_pairs"].spark_fn(spark, SF)
    plan = _formatted(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_semdedup_within_cell_join_shape(spark):
    """semdedup_cells: the only all-pairs structure allowed is the
    vector-by-centroid scoring (tiny broadcast side, like ann_ivf_topk);
    the member-by-member comparison must be an equi-join on the cell key —
    at scale the cell is the shuffle key and k bounds the in-cell
    quadratic, so a CartesianProduct among members would be the O(n²)
    failure the operator exists to avoid."""
    from dedup_domains_spark.plans.queries import QUERIES

    df = QUERIES["semdedup_cells"].spark_fn(spark, SF)
    plan = _formatted(df)
    assert "CartesianProduct" not in plan, plan
    # the within-cell pair join keys on cent_id (an equi-join), visible as a
    # hash/sort-merge join keyed on cent_id in the formatted plan
    assert "cent_id" in plan, plan


def test_exact_dedup_single_shuffle(spark):
    from dedup_domains_spark.operators.exact_dedup import exact_dedup
    from dedup_domains_spark.sources.code_corpus import with_row_identity

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("source").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.md5("text").alias("commit"),
        "lang",
        F.col("text").alias("content"),
    )
    res = exact_dedup(with_row_identity(docs))
    plan = _formatted(res.cluster_map)
    # the window election shuffles on content_sha256 exactly once
    assert plan.count("Exchange hashpartitioning(content_sha256") <= 2, plan


def test_asof_join_no_nested_loop(spark):
    """The as-of join must plan as window-over-union — no range join, no
    BroadcastNestedLoop/CartesianProduct anywhere."""
    from dedup_domains_spark.plans.queries import QUERIES

    plan = _formatted(QUERIES["events_asof_orders"].spark_fn(spark, SF))
    assert "BroadcastNestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Window" in plan, plan


def test_range_join_is_bucketed_equi_join(spark):
    """The 7-day range join must be an equi-join on (user, bucket) — a hash
    or sort-merge join — never a nested-loop over the inequality."""
    from dedup_domains_spark.plans.queries import QUERIES

    plan = _formatted(QUERIES["orders_events_range_7d"].spark_fn(spark, SF))
    assert "BroadcastNestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_quality_metrics_have_no_shuffle(spark):
    """repetition_quality and pii_scrub are map-side only: zero Exchange in
    the plan (they must run at scan speed at 100 TB)."""
    from dedup_domains_spark.plans.queries import QUERIES

    for name in ("repetition_quality", "pii_scrub"):
        plan = _formatted(QUERIES[name].spark_fn(spark, SF))
        assert "Exchange" not in plan, f"{name} shuffles:\n{plan}"


def test_stratified_sample_is_map_side_only(spark):
    """The deterministic sampler is a pure filter: zero Exchange — at
    10^12 rows it must run at scan speed."""
    from dedup_domains_spark.plans.queries import QUERIES

    plan = _formatted(QUERIES["stratified_sample"].spark_fn(spark, SF))
    assert "Exchange" not in plan, plan


def test_repo_jaccard_no_cartesian(spark):
    """Repo-level Jaccard must stay an equi-join on the file hash — never a
    cartesian over the repo list (which is NOT broadcastable at 10^8 repos)."""
    from dedup_domains_spark.plans.queries import QUERIES

    plan = _formatted(QUERIES["repo_file_jaccard"].spark_fn(spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_line_scrub_flagged_set_broadcasts(spark):
    """The boilerplate-line scrub must broadcast the (tiny by definition)
    flagged-hash set back to the exploded lines — the wide line column must
    not shuffle a second time for the scrub join."""
    from dedup_domains_spark.plans.queries import QUERIES

    plan = _formatted(QUERIES["line_boilerplate_scrub"].spark_fn(spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_tfidf_vocab_never_broadcast_and_topk_prunes_early(spark):
    """tfidf_topk_terms at web scale: the document-frequency table is the
    VOCABULARY (billions of distinct tokens) so it must ride a
    term-partitioned window, never a broadcast join; the only broadcast
    allowed is the single-row corpus count (IdentityBroadcastMode nested
    loop). The top-k must prune map-side: a Partial WindowGroupLimit below
    the doc-key Exchange, so at most k rows per doc reach the shuffle."""
    from dedup_domains_spark.plans.queries import QUERIES

    plan = _formatted(QUERIES["tfidf_topk_terms"].spark_fn(spark, SF))
    assert "BroadcastHashJoin" not in plan, plan
    # exactly one nested-loop node in the plan TREE (the string repeats in
    # the node-detail section, so count the tree line, not the bare name)
    assert plan.count("BroadcastNestedLoopJoin Inner BuildRight") == 1, plan
    assert "IdentityBroadcastMode" in plan, plan
    assert "row_number(), 5, Partial" in plan, plan
