"""Tutorial 2 — IVF-partitioned search (reference parity:
Auncel/tutorial/python/2-IVFFlat.py — train -> add -> search, then
raise nprobe), plus the engine's flagship extension the reference adds
on top of this index: error-bounded adaptive search."""
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
nlist = 32                        # reference uses 100 at 100k vectors
k = 4
index = graft.IndexIVFFlat(spark, d, nlist)

assert not index.is_trained
index.train(xb)
assert index.is_trained

index.add(xb)                     # add may be a bit slower as well
D, I = index.search(xq, k)        # actual search, nprobe = 1
print(I[-5:])                     # neighbours of the 5 last queries
index.nprobe = nlist              # probe everything -> exact
D, I2 = index.search(xq, k)
print(I2[-5:])

# self-checks: nprobe = nlist IS the exact answer; nprobe = 1 is a
# subset-of-lists approximation whose recall is decent but not forced
exact = graft.IndexFlatL2(spark, d)
exact.add(xb)
De, Ie = exact.search(xq, k)
assert (I2 == Ie).all(), "nprobe=nlist must equal brute force"
recall1 = (I == Ie).mean()
index.nprobe = 8
D8, I8 = index.search(xq, k)
recall8 = (I8 == Ie).mean()
print(f"recall@1-probe {recall1:.3f} recall@8-probe {recall8:.3f}")
# uniform 64-d vectors are the hard case for coarse quantization —
# recall must be non-trivial at 1 probe and climb with probe depth
assert recall1 > 0.1, "nprobe=1 recall implausibly low"
assert recall8 >= max(recall1, 0.5), "recall must climb with nprobe"

# --- the flagship extension: bounded-error adaptive search ----------
xt = np.random.random((100, d)).astype('float32')  # held-out training
xt[:, 0] += np.arange(100) / 1000.
index.train_profile(xt)
D3, I3, stats = index.search_bounded(xq, k, required_recall=0.9)
recall_b = (I3 == Ie).mean()
nprobes = [r.nprobeUsed for r in stats.collect()]
print(f"bounded recall {recall_b:.3f} nprobe mean "
      f"{sum(nprobes)/len(nprobes):.1f} (of {nlist})")
assert recall_b >= 0.9, "bounded search must hit its recall target"
assert max(nprobes) <= nlist and min(nprobes) >= 1
print("[tutorial-2] PASS")
