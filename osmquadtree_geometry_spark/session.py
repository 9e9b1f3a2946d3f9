"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "osmquadtree_geometry_spark",
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    b = (
        SparkSession.builder.master(master).appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled",
                os.environ.get("SPARK_GRAFT_AQE", "true"))
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # default 64m advisory size coalesces local-scale shuffles to a
        # single partition, serializing every stage; 8m keeps ~cores
        # partitions at test scale while staying irrelevant at TB scale
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # write_bucketed leaves exactly ONE file per bucket, so the
        # planning-time file listing this enables is O(n_buckets) and
        # the per-bucket sort order reaches the scan: bucketed merge
        # joins run sort-free (Spark only assumes bucket order when a
        # bucket has at most one file, so this is safe for any layout)
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
        # the scan side carries the explode+parse work; 128m splits a
        # local single-file fixture into ~3 tasks (tune per deployment:
        # at 100TB with thousands of files the default is fine)
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        # local-mode shuffles go through spark.local.dir; on this host
        # /tmp is disk-backed and serializes concurrent shuffle IO —
        # use tmpfs when available (a real cluster uses local NVMe)
        .config("spark.local.dir",
                "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp")
        # collect_list over millions of groups (the J1 per-way regroup,
        # J2 member collect) always exceeds ObjectHashAggregate's
        # fallback threshold and re-sorts anyway — skipping the doomed
        # hash attempt measured -9% wall / -10% cpu at 4 cores and
        # -12% at 16 on the 14M-doc metric job, a wash at 32 (minima).
        # CAVEAT: internal conf (may be renamed across Spark versions)
        # applied session-wide, so small-group object aggregates lose
        # ObjectHashAggregate too; SPARK_GRAFT_OBJECT_HASH_AGG=true
        # restores the stock planner for mixed workloads
        .config("spark.sql.execution.useObjectHashAggregateExec",
                os.environ.get("SPARK_GRAFT_OBJECT_HASH_AGG", "false"))
        # G1's concurrent cycles thrash with 32 task threads on this
        # allocation-heavy batch workload (measured 2.3x slower);
        # throughput collector wins for pure batch
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        # InferFiltersFromGenerate synthesizes `size(gen) > 0 AND
        # isnotnull(gen)` above every explode, duplicating the
        # generator expression twice, and predicate pushdown then
        # re-inlines any staged upstream columns into both copies —
        # for higher-order-function generators (shingling: a split()
        # referenced inside the lambda) that turns into a per-ELEMENT
        # re-tokenize, measured 5x slower at ANY scale (7-10s vs
        # 0.6-0.9s on the 50k-doc shingle explode).  Our generators
        # are never-empty by construction, so the pruning the rule
        # buys is nil; excluding it is scale-independent
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer."
                "InferFiltersFromGenerate")
    )
    # ad-hoc experiment overrides: "k=v;k=v" (bench A/B harness)
    extra = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for kv in filter(None, extra.split(";")):
        k, _, v = kv.partition("=")
        b = b.config(k.strip(), v.strip())
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
