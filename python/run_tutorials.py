#!/usr/bin/env python3
"""CI runner for the tutorial-parity examples: executes each tutorial
in-process (graft.connect() reuses one JVM across them), non-zero exit
on any assertion failure — the pyspark_smoke.py discipline.

Run from the repo root after `sbt compile`:

    python3 python/run_tutorials.py
"""
import os
import runpy
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
TUTORIALS = ["1-Flat.py", "2-IVFFlat.py", "3-IVFPQ.py"]

if __name__ == "__main__":
    for t in TUTORIALS:
        print(f"[tutorials] running {t}")
        runpy.run_path(os.path.join(HERE, "tutorial", t), run_name="__main__")
    print("[tutorials] ALL PASS")
    sys.exit(0)
