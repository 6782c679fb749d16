"""graft from Python — the reference tutorial idiom over Spark.

The reference engine's Python surface is

    import faiss
    index = faiss.IndexFlatL2(d)
    index.add(xb)
    D, I = index.search(xq, k)

(``Auncel/tutorial/python/1-Flat.py``). This module mirrors that shape
over a Spark-native engine: vectors live in DataFrames (or numpy arrays
that this module converts), indexes are trained models plus assigned
tables, and ``search`` returns either numpy ``(D, I)`` (numpy in) or a
DataFrame (DataFrame in). All heavy lifting happens in the JVM through
``graft.PyFacade`` — no Python UDFs anywhere, so plans stay inside
whole-stage codegen.

Quick start (from the repo root, after ``sbt compile``)::

    import numpy as np
    import graft

    spark = graft.connect()                  # graft-aware SparkSession
    xb = np.random.rand(10000, 64).astype('float32')
    xq = np.random.rand(100, 64).astype('float32')

    index = graft.IndexFlatL2(spark, 64)
    index.add(xb)
    D, I = index.search(xq, k=4)             # shapes (100, 4)

    ivf = graft.IndexIVFFlat(spark, 64, nlist=32)
    ivf.train(xb); ivf.add(xb)
    ivf.nprobe = 8
    D, I = ivf.search(xq, k=4)

    ivf.train_profile(xt)                    # held-out training queries
    D, I, stats = ivf.search_bounded(xq, k=4, required_recall=0.9)

Kernels note: ``graft_cosine`` (and ``Index*`` cosine scoring) is the
raw cosine — NaN when either vector is all-zero, like every engine's
raw cosine; pre-filter dead embeddings or use the dedup operators,
which guard this themselves.

GPU tutorials (4-GPU.py, 5-Multiple-GPUs.py) have no equivalent here:
this engine scales out over Spark executors instead of GPUs.
"""
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (ArrayType, FloatType, LongType, StructField,
                               StructType)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CLASSES = os.path.join(_REPO, "target", "scala-2.13", "classes")

_VEC_SCHEMA = StructType([
    StructField("id", LongType(), False),
    StructField("vec", ArrayType(FloatType(), False), False),
])
_Q_SCHEMA = StructType([
    StructField("qid", LongType(), False),
    StructField("vec", ArrayType(FloatType(), False), False),
])


def connect(master="local[8]", classpath=_CLASSES, app="graft-python"):
    """A graft-aware SparkSession: library classes on the driver
    classpath, SQL kernels injected via ``graft.GraftExtensions``.
    Reuses the active session if one exists (so tutorial scripts can
    share one JVM)."""
    return (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.driver.extraClassPath", classpath)
        .config("spark.sql.extensions", "graft.GraftExtensions")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _facade(spark):
    return spark._jvm.graft.PyFacade


def _to_vec_df(spark, x, schema, start_id=0):
    """numpy (n, d) float32 -> DataFrame(id/qid LONG, vec ARRAY<FLOAT>);
    DataFrames pass through untouched."""
    if isinstance(x, DataFrame):
        return x
    rows = [(int(start_id + i), [float(v) for v in row]) for i, row in enumerate(x)]
    return spark.createDataFrame(rows, schema)


def _to_numpy(result_df, nq, k, flip_sign):
    """(qid, id, dist, rank) rows -> dense (D, I) numpy arrays, missing
    slots (k > candidates) filled with the faiss convention (-1 ids)."""
    import numpy as np

    D = np.full((nq, k), np.inf, dtype="float32")
    I = np.full((nq, k), -1, dtype="int64")
    for r in result_df.select("qid", "id", "dist", "rank").collect():
        D[r.qid][r.rank - 1] = -r.dist if flip_sign else r.dist
        I[r.qid][r.rank - 1] = r.id
    return D, I


class _IndexBase(object):
    def __init__(self, spark, d, metric):
        self.spark = spark
        self.d = d
        self.metric = metric
        self._base = None
        self.ntotal = 0

    def add(self, xb):
        """Add vectors: numpy (n, d) float32, or a DataFrame with
        (id LONG, vec ARRAY<FLOAT>). Ids are assigned sequentially from
        ntotal for numpy input (the reference's add-order convention)."""
        df = _to_vec_df(self.spark, xb, _VEC_SCHEMA, start_id=self.ntotal)
        self._base = df if self._base is None else self._base.unionByName(df)
        self.ntotal += df.count()
        self._added()

    def _added(self):
        pass

    def _search_df(self, queries, k):
        raise NotImplementedError

    def search(self, xq, k):
        """numpy in -> (D, I) numpy out, shapes (nq, k); DataFrame
        (qid, vec) in -> (qid, id, dist, rank) DataFrame out."""
        if isinstance(xq, DataFrame):
            return self._search_df(xq, k)
        q = _to_vec_df(self.spark, xq, _Q_SCHEMA)
        return _to_numpy(self._search_df(q, k), len(xq), k,
                         flip_sign=self.metric == "ip")


class IndexFlatL2(_IndexBase):
    """Exact brute-force L2 index — ``1-Flat.py`` parity. D holds
    SQUARED L2 distances, exactly as the reference's IndexFlatL2."""

    def __init__(self, spark, d):
        super().__init__(spark, d, "l2")
        self.is_trained = True

    def _search_df(self, queries, k):
        jdf = _facade(self.spark).flatSearch(
            self._base._jdf, queries._jdf, k, self.metric)
        return DataFrame(jdf, self.spark)


class IndexFlatIP(IndexFlatL2):
    """Exact brute-force inner-product index; D holds raw inner
    products (largest = best), the reference's METRIC_INNER_PRODUCT."""

    def __init__(self, spark, d):
        super().__init__(spark, d)
        self.metric = "ip"


class IndexIVFFlat(_IndexBase):
    """IVF-partitioned exact search — ``2-IVFFlat.py`` parity:
    train -> add -> search, with a mutable ``nprobe``. Also carries the
    engine's flagship extension: ``train_profile`` + ``search_bounded``
    (error-bounded adaptive search, the reference's eval/bound path)."""

    def __init__(self, spark, d, nlist, metric="l2", seed=42):
        super().__init__(spark, d, metric)
        self.nlist = nlist
        self.seed = seed
        self.nprobe = 1
        self.is_trained = False
        self._model = None
        self._assigned = None
        self._traces = None
        self._train_df = None

    def train(self, xb):
        self._train_df = _to_vec_df(self.spark, xb, _VEC_SCHEMA)
        self._model = _facade(self.spark).trainIvf(
            self._train_df._jdf, self.nlist, self.metric, self.seed)
        self.is_trained = True

    def _added(self):
        assert self.is_trained, "train() before add()"
        jdf = _facade(self.spark).assign(self._base._jdf, self._model)
        self._assigned = DataFrame(jdf, self.spark).cache()
        self._assigned.count()

    def _search_df(self, queries, k):
        jdf = _facade(self.spark).ivfSearch(
            self._assigned._jdf, self._model, queries._jdf, k, self.nprobe)
        return DataFrame(jdf, self.spark)

    def train_profile(self, xt, max_topk=10, bs=50):
        """Train the error profile on held-out queries xt (numpy or
        (qid, vec) DataFrame); required before search_bounded."""
        q = _to_vec_df(self.spark, xt, _Q_SCHEMA)
        self._traces = _facade(self.spark).trainProfile(
            self._assigned._jdf, self._model, q._jdf, max_topk, bs)

    def search_bounded(self, xq, k, required_recall=0.9, multiplier=4.0,
                       std_m=1.0):
        """Error-bounded adaptive search: per-query probe depth chosen
        to meet ``required_recall``. Returns (D, I, stats) for numpy
        input or (results_df, stats_df) for DataFrame input; stats has
        one row per query with the decided nprobe."""
        assert self._traces is not None, "train_profile() first"
        q = xq if isinstance(xq, DataFrame) \
            else _to_vec_df(self.spark, xq, _Q_SCHEMA)
        pair = _facade(self.spark).boundedSearch(
            self._assigned._jdf, self._model, self._traces, q._jdf, k,
            float(required_recall), float(multiplier), float(std_m))
        results = DataFrame(pair[0], self.spark)
        stats = DataFrame(pair[1], self.spark)
        if isinstance(xq, DataFrame):
            return results, stats
        D, I = _to_numpy(results, len(xq), k, flip_sign=self.metric == "ip")
        return D, I, stats


class IndexIVFPQ(IndexIVFFlat):
    """IVF + product-quantized residual codes — ``3-IVFPQ.py`` parity:
    memory-compressed search, D holds APPROXIMATE (ADC) distances."""

    def __init__(self, spark, d, nlist, m, nbits=8, metric="l2", seed=42):
        super().__init__(spark, d, nlist, metric, seed)
        self.m = m
        self.nbits = nbits
        self._pq = None
        self._encoded = None

    def train(self, xb):
        """Trains the coarse quantizer AND the residual PQ codebooks on
        the training set — the reference's train() contract (3-IVFPQ.py
        trains once, then add only encodes)."""
        super().train(xb)
        f = _facade(self.spark)
        train_assigned = DataFrame(
            f.assign(self._train_df._jdf, self._model), self.spark)
        self._pq = f.trainPq(train_assigned._jdf, self._model,
                             self.m, self.nbits, self.seed)

    def _added(self):
        super()._added()
        assert self._pq is not None, "train() before add()"
        jdf = _facade(self.spark).encodePq(self._assigned._jdf, self._model,
                                           self._pq)
        self._encoded = DataFrame(jdf, self.spark).cache()
        self._encoded.count()

    def _search_df(self, queries, k):
        jdf = _facade(self.spark).ivfpqSearch(
            self._encoded._jdf, self._model, self._pq, queries._jdf, k,
            self.nprobe)
        return DataFrame(jdf, self.spark)
