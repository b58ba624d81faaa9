"""Substep decomposition of embedding_knn_join_multiprobe_top3 (r14).

Splits the query into its sequential driver jobs and times each:
  1. kmeans_fit collects (seed + 2 Lloyd iterations) over the persisted
     quantized table
  2. assignment localCheckpoint (argmin over 8x64-literal expressions)
  3. probe-cells localCheckpoint (full 8-struct sort per row)
  4. the salted candidate pair join + window top-k (the only
     corpus-shaped stage)

Usage: python tools/knn_decompose.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from projet_etl_a_rien_spark.queries import _load_extensions
from projet_etl_a_rien_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    _load_extensions()
    from projet_etl_a_rien_spark.catalog import load_table
    from projet_etl_a_rien_spark.operators import similarity as S
    from projet_etl_a_rien_spark.queries_llm import (
        KMEANS_ITERS,
        KMEANS_K,
        KMEANS_SCALE,
        KNN_PROBES,
    )
    from pyspark.sql import functions as F

    spark = get_spark("knn-decompose")
    spark.range(1000).selectExpr("sum(id)").collect()

    for run in range(2):
        emb = load_table(spark, sf_dir, "embeddings")
        t0 = time.perf_counter()
        q_all = emb.select(
            F.col("vec_id").alias("id"), S.quantize("embedding", KMEANS_SCALE).alias("q")
        )
        cached = S._widen(q_all, emb, "id").persist()
        centroids = S._fit_centroids(cached, KMEANS_K, KMEANS_ITERS)
        t1 = time.perf_counter()
        assign = (
            S._assign(cached, centroids)
            .select(F.col("id").alias("vec_id"), "cluster")
            .localCheckpoint(eager=True)
        )
        t2 = time.perf_counter()
        probe = (
            S._probe_cells(cached, centroids, KNN_PROBES)
            .select(F.col("id").alias("vec_id"), "probe_cells")
            .localCheckpoint(eager=True)
        )
        t3 = time.perf_counter()
        cached.unpersist()
        out = S.ann_knn_join(
            emb, assign, k=3, probe_assignments=probe, compute_splits=32
        )
        out.write.format("noop").mode("overwrite").save()
        t4 = time.perf_counter()
        print(
            f"run{run}: fit={t1-t0:6.3f} assign={t2-t1:6.3f} "
            f"probe={t3-t2:6.3f} join+topk={t4-t3:6.3f} total={t4-t0:6.3f}",
            flush=True,
        )
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
