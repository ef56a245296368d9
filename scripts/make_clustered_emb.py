"""Generate the CLUSTERED embedding fixture (VERDICT r6 item 5).

The driver's embeddings fixture is near-random 64-d vectors — the worst
case for coarse quantization (IVF's probe cut approaches the probe
fraction of the whole corpus, so at 200k vectors IVF ran 107 s vs 40 s
brute in the round-6 sitting). Real text/image embeddings are heavily
clustered; this script plants that structure so the compressed indexes
can be measured on the case they exist for:

- k cluster centers ~ N(0, I_64), assigned uniformly at random
- vector = center[c] + N(0, sigma^2 I); sigma=0.06 gives mean
  intra-cluster cosine ~0.9 while inter-center |cosine| stays ~0.125
  (random 64-d directions) — a conservative stand-in for the cluster
  tightness of sentence-embedding corpora
- same schema as the driver fixture (vec_id BIGINT, embedding FLOAT[],
  label INT = true cluster id), deterministic from seed 42

    python scripts/make_clustered_emb.py [--n 200000] [--k 100] \
        [--dst /root/repo/testdata_embclu]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--sigma", type=float, default=0.06)
    ap.add_argument("--dst", default="/root/repo/testdata_embclu")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    centers = rng.normal(size=(args.k, args.dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, args.k, size=args.n)
    vecs = (
        centers[labels] + rng.normal(size=(args.n, args.dim)) * args.sigma
    ).astype(np.float32)

    os.makedirs(args.dst, exist_ok=True)
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(args.n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1)), args.dim
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(labels.astype(np.int32)),
        }
    )
    out = os.path.join(args.dst, "embeddings.parquet")
    pq.write_table(table, out)
    print(f"wrote {args.n} x {args.dim}d vectors, {args.k} clusters -> {out}")


if __name__ == "__main__":
    main()
