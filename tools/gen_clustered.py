#!/usr/bin/env python
"""Deterministic CLUSTERED embedding fixture (mixture of Gaussians).

The driver's synthetic ``embeddings`` table is uniform noise, which caps
IVF recall at ~nprobe/K once the corpus outgrows the coarse cells (the
round-11 ANN ledger measured 2/10 at sf0.1) and inverts the residual-
encoding verdict — real embedding corpora CLUSTER, so cell routing finds
most of the true neighbors in a few cells.  This tool writes a fixture
with that structure so tools/ann_quality.py can measure what the index
actually buys (VERDICT r11 #3).

Design (all pure functions of a fixed seed — bit-reproducible):

- C = 8 Gaussian clusters in DIM=64, matching the operators' 8 coarse
  cells; cluster centers ~ N(0, CENTER_SCALE^2 I) with CENTER_SCALE=8,
  points = center + N(0, 1) — separation >> spread, the "well-clustered
  corpus" regime.
- cluster id = vec_id % 8, so the operators' fixed coarse-centroid seeds
  (vec_ids 1..8, operators/ivfpq.py IVFPQ_CENT_IDS) land one per cluster
  and the PQ codebook seeds (vec_ids 1..16) cover every cluster twice.
  No operator code changes: the same "trained" stand-in centroids become
  genuinely representative because the DATA clusters.
- label = cluster id (int32), embedding float32 — same schema as the
  driver's embeddings.parquet, so load_table/operators run unmodified.

Usage:
  python tools/gen_clustered.py --n 500  --out .testdata_clustered/n500
  python tools/gen_clustered.py --n 5000 --out .testdata_clustered/n5000
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIM = 64
N_CLUSTERS = 8
CENTER_SCALE = 8.0
SEED = 20260815


def gen(n: int) -> pa.Table:
    rng = np.random.default_rng(SEED)
    centers = rng.normal(0.0, CENTER_SCALE, size=(N_CLUSTERS, DIM))
    cluster = np.arange(n, dtype=np.int64) % N_CLUSTERS
    noise = rng.normal(0.0, 1.0, size=(n, DIM))
    vecs = (centers[cluster] + noise).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(cluster.astype(np.int32)),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500)
    ap.add_argument("--out", default=".testdata_clustered/n500")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "embeddings.parquet")
    pq.write_table(gen(args.n), path)
    print(f"wrote {path} (n={args.n}, {N_CLUSTERS} clusters, dim={DIM})")


if __name__ == "__main__":
    main()
