"""Tutorial 1 — exact brute-force search (reference parity:
Auncel/tutorial/python/1-Flat.py, scaled down for CI speed; the idiom
is identical: build -> add -> search -> read (D, I))."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import graft  # noqa: E402

d = 64                            # dimension
nb = 10000                        # database size (reference uses 100k)
nq = 100                          # nb of queries (reference uses 10k)
np.random.seed(1234)              # make reproducible
xb = np.random.random((nb, d)).astype('float32')
xb[:, 0] += np.arange(nb) / 1000.
xq = np.random.random((nq, d)).astype('float32')
xq[:, 0] += np.arange(nq) / 1000.

spark = graft.connect()
index = graft.IndexFlatL2(spark, d)   # build the index
print(index.is_trained)
index.add(xb)                     # add vectors to the index
print(index.ntotal)

k = 4                             # we want to see 4 nearest neighbours
D, I = index.search(xb[:5], k)    # sanity check
print(I)
print(D)
# self-check (the reference prints these; CI asserts them): each base
# vector is its own nearest neighbour at distance 0
assert (I[:, 0] == np.arange(5)).all(), "self-NN must rank first"
assert np.allclose(D[:, 0], 0.0, atol=1e-4), "self-distance must be 0"
assert (np.diff(D, axis=1) >= -1e-6).all(), "distances must ascend"

D, I = index.search(xq, k)        # actual search
print(I[:5])                      # neighbours of the 5 first queries
print(I[-5:])                     # neighbours of the 5 last queries
assert I.shape == (nq, k) and (I >= 0).all()
# exactness: brute-force numpy oracle agrees on query 0's neighbour set
d0 = ((xb - xq[0]) ** 2).sum(axis=1)
assert set(I[0]) == set(np.argsort(d0, kind="stable")[:k]), \
    "flat search must equal the numpy brute-force oracle"
print("[tutorial-1] PASS")
