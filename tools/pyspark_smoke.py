#!/usr/bin/env python3
"""PySpark reachability smoke test for the graft library.

The reference engine's primary user surface is Python, so the
Spark-native equivalent must be drivable from pyspark.sql without any
Scala on the user's side. This script proves the three layers a Python
user touches, in CI fashion (non-zero exit on any failure):

  1. the codegen'd SQL kernels (graft_l2sqr / graft_dot / graft_cosine /
     graft_hamming) injected via spark.sql.extensions — pure SQL, no
     Python UDF, whole-stage codegen intact;
  2. a brute-force top-k ANN written entirely in pyspark.sql over those
     kernels (the "I just want cosine top-k over my parquet" user);
  3. the full query inventory through the JVM gateway
     (graft.SparkEntry.queries) — flat, IVF and error-bounded adaptive
     search, same entry points the Scala driver uses.

Run (after `sbt compile`, from the repo root):

  python3 tools/pyspark_smoke.py [sf_dir]

or via spark-submit:

  spark-submit --driver-memory 4g \
    --conf spark.driver.extraClassPath=target/scala-2.13/classes \
    --conf spark.sql.extensions=graft.GraftExtensions \
    tools/pyspark_smoke.py [sf_dir]

sf_dir defaults to /root/testdata/sf0.001.
"""
import os
import sys

from pyspark.sql import DataFrame, SparkSession

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLASSES = os.path.join(REPO, "target", "scala-2.13", "classes")


def build_session():
    return (
        SparkSession.builder.master("local[8]")
        .appName("graft-pyspark-smoke")
        .config("spark.driver.extraClassPath", CLASSES)
        .config("spark.sql.extensions", "graft.GraftExtensions")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def check(name, cond, detail=""):
    status = "PASS" if cond else "FAIL"
    print(f"[pysmoke] {status} {name} {detail}")
    if not cond:
        sys.exit(1)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session()
    spark.sparkContext.setLogLevel("WARN")

    # --- 1. injected SQL kernels ------------------------------------
    row = spark.sql(
        "SELECT graft_l2sqr(array(1.0F, 2.0F), array(4.0F, 6.0F)) AS l2,"
        "       graft_dot(array(1.0F, 2.0F), array(4.0F, 6.0F)) AS dp,"
        "       graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS cs,"
        "       graft_hamming(array(0L, 0L), array(-1L, 0L)) AS hm"
    ).collect()[0]
    check("sql kernels injected via spark.sql.extensions",
          row.l2 == 25.0 and row.dp == 16.0
          and abs(row.cs - 1.0) < 1e-12 and row.hm == 64,
          f"l2={row.l2} dot={row.dp} cos={row.cs} ham={row.hm}")
    # documented semantics (docs/PYTHON.md): graft_cosine is the RAW
    # cosine — NaN on an all-zero vector, never a silent 0 or 1
    import math
    nan_row = spark.sql(
        "SELECT graft_cosine(array(0.0F, 0.0F), array(1.0F, 0.0F)) AS cs"
    ).collect()[0]
    check("graft_cosine(zero vector) is NaN as documented",
          nan_row.cs is not None and math.isnan(nan_row.cs),
          f"cos={nan_row.cs}")

    # --- 2. pure-pyspark cosine top-k over the embeddings table ------
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb.createOrReplaceTempView("embeddings")
    n = emb.count()
    topk = spark.sql(
        """
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, graft_cosine(embedding, q.qv) AS cos
        FROM embeddings CROSS JOIN q
        ORDER BY cos DESC, vec_id LIMIT 10
        """
    ).collect()
    check("pyspark-sql cosine top-10 over embeddings",
          len(topk) == 10 and topk[0].vec_id == 0
          and abs(topk[0].cos - 1.0) < 1e-6
          and all(topk[i].cos >= topk[i + 1].cos for i in range(9)),
          f"n={n} best={topk[0].vec_id}@{topk[0].cos:.4f}")
    plan = spark.sql(
        "SELECT graft_cosine(embedding, embedding) FROM embeddings"
    )._jdf.queryExecution().executedPlan().toString()
    # "*(n)" prefixes every WholeStageCodegen stage in the compact plan
    # string; a Python UDF would show up as a BatchEvalPython operator
    check("kernels stay inside WholeStageCodegen (no Python UDF)",
          "*(" in plan and "BatchEvalPython" not in plan)

    # --- 3. the Scala query inventory through the JVM gateway --------
    jvm = spark._jvm
    jss = spark._jsparkSession
    entry = DataFrame(jvm.graft.SparkEntry.entry(jss), spark)
    check("SparkEntry.entry (flagship) rows > 0", entry.count() > 0)

    queries = jvm.graft.SparkEntry.queries()
    for name, min_rows in [("v01_knn_flat", 10),
                           ("v05_ivf_exact", 10),
                           ("a01_bounded_search", 10)]:
        jdf = queries.apply(name).apply(jss, sf_dir)
        df = DataFrame(jdf, spark)
        rows = df.count()
        check(f"inventory {name} via py4j", rows >= min_rows,
              f"rows={rows} cols={df.columns}")

    # --- 4. the packaged Python module (python/graft.py) -------------
    sys.path.insert(0, os.path.join(REPO, "python"))
    import graft as g  # noqa: E402  (reuses this session via getOrCreate)
    import numpy as np  # noqa: E402

    rng = np.random.RandomState(7)
    xb = rng.rand(500, 16).astype("float32")
    idx = g.IndexFlatL2(spark, 16)
    idx.add(xb)
    D, I = idx.search(xb[:3], k=2)
    check("python module IndexFlatL2 tutorial idiom",
          idx.ntotal == 500 and (I[:, 0] == np.arange(3)).all()
          and np.allclose(D[:, 0], 0.0, atol=1e-5),
          f"ntotal={idx.ntotal} I0={I[:, 0].tolist()}")

    print("[pysmoke] ALL PASS")
    spark.stop()


if __name__ == "__main__":
    main()
