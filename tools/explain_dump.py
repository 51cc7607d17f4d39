"""Dump .explain('formatted') for catalog queries to plans/<tag>/<q>_<suffix>.txt.

Usage: python tools/explain_dump.py <suffix> [query ...]
  suffix: 'before' or 'after' (files land in plans/r06/)
  query:  catalog names; defaults to the bench HEADLINE list.

Queries whose builders materialize eagerly (localCheckpoint) run those jobs
during construction; the captured plan is the plan of the returned DataFrame,
which is what the bench's count() executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, SF_DIR, CPUS  # noqa: E402
from dedup_domains_spark import get_spark  # noqa: E402
from dedup_domains_spark.plans.queries import QUERIES  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r06",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain-dump", parallelism=CPUS, shuffle_partitions=CPUS)
    for name in names:
        df = QUERIES[name].spark_fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
