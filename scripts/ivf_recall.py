"""Recall@k comparison: seeded vs k-means-trained IVF quantizer vs
brute force, at a given sf dir (round-4 verdict Next #6).  Prints one
JSON line; paste into BENCH/ROUND5.md.

Usage: python scripts/ivf_recall.py [sf_dir] [k] [n_queries]
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from osmquadtree_geometry_spark.session import get_spark  # noqa: E402
from osmquadtree_geometry_spark.similarity import (  # noqa: E402
    brute_force_topk, ivf_topk, train_centroids_kmeans)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    spark = get_spark("ivf_recall")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    n_lists = max(16, int(n ** 0.5))
    q = (emb.orderBy("vec_id").limit(n_q)
         .selectExpr("vec_id as query_id", "embedding as qe"))
    exact = {}
    for r in brute_force_topk(emb, q, k=k).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)

    out = {"sf_dir": sf_dir, "n_vectors": n, "k": k,
           "n_queries": n_q, "n_lists": n_lists}
    trained = train_centroids_kmeans(emb, n_lists=n_lists, n_iters=10)
    for n_probe in (2, 4, 8):
        for name, cent in (("seeded", None), ("trained", trained)):
            t0 = time.monotonic()
            got = {}
            res = ivf_topk(emb, q, k=k, n_lists=n_lists,
                           n_probe=n_probe, centroids=cent)
            for r in res.collect():
                got.setdefault(r.query_id, set()).add(r.vec_id)
            hits = sum(len(exact[qid] & got.get(qid, set()))
                       for qid in exact)
            total = sum(len(v) for v in exact.values())
            out[f"recall@{k}_{name}_probe{n_probe}"] = round(hits / total, 4)
            out[f"sec_{name}_probe{n_probe}"] = round(
                time.monotonic() - t0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
