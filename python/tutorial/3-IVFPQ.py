"""Tutorial 3 — IVF + product quantization (reference parity:
Auncel/tutorial/python/3-IVFPQ.py): compressed residual codes, ADC
distances, sanity-checked against the exact index."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import graft  # noqa: E402

d = 64
nb = 10000                        # reference uses 100k
nq = 100
np.random.seed(1234)
xb = np.random.random((nb, d)).astype('float32')
xb[:, 0] += np.arange(nb) / 1000.
xq = np.random.random((nq, d)).astype('float32')
xq[:, 0] += np.arange(nq) / 1000.

spark = graft.connect()
nlist = 32
m = 8                             # sub-quantizers
k = 4
index = graft.IndexIVFPQ(spark, d, nlist, m, 8)
                                  # 8 = bits per sub-vector code

index.train(xb)
index.add(xb)
D, I = index.search(xb[:5], k)    # sanity check
print(I)
print(D)
# PQ distances are approximate: the self-vector should rank in the
# top-k and its ADC distance should be near (not exactly) 0
self_hit = (I[:, :2] == np.arange(5)[:, None]).any(axis=1)
assert self_hit.all(), "self-NN must appear in the top 2 under PQ"

index.nprobe = 10                 # make comparable with experiment above
D, I = index.search(xq, k)        # search
print(I[-5:])
exact = graft.IndexFlatL2(spark, d)
exact.add(xb)
De, Ie = exact.search(xq, k)
recall = (I == Ie).mean()
print(f"ivfpq recall vs exact {recall:.3f}")
# uniform random vectors are incompressible — 8-byte codes over 64-d
# uniform data quantize coarsely (the reference tutorial's own output
# is visibly approximate); assert non-trivial, not high
assert recall > 0.05, "PQ recall implausibly low"
print("[tutorial-3] PASS")
