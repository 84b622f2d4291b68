#!/usr/bin/env python3
"""Per-query shuffle-volume scaling across a corpus step — the engine-level
complexity CONTRACT audit, as data.

Wall time in local mode is dominated by job overhead at small SFs, so time
ratios across scale factors mislead; SHUFFLE BYTES are the honest scale
signal (they are what grows into the network/disk bottleneck on a real
cluster). This compares BENCH_DETAIL per-query shuffle_mb from two Bench
runs (e.g. sf0.01 vs sf0.1 — a 10x step on every table except embeddings,
which the driver generates at 4x) and checks each query's measured growth
against its DOCUMENTED complexity class:

  linear      ratio <= growth^1.2   the default contract: shuffle tracks
                                    the data (cell/bucket-scoped pair
                                    joins with size-constant dials land
                                    here — e.g. the k = N/c semantic
                                    quantizer family)
  dial-super  ratio <= growth^2.2   DOCUMENTED superlinear candidate
                                    generation: the fixed-dial ANN family
                                    (k = ceil(sqrt(N)) cells + 2*sqrt(k)
                                    probes => N^1.75; fixed-bucket LSH =>
                                    N^2/B). The 100 TB path re-dials with
                                    N (bits/tables/k grow), exactly as
                                    the semantic family already does —
                                    this class records the trade, it does
                                    not excuse an undocumented blowup.
  MISMATCH    anything else         a query growing outside its
                                    documented class — a regression.

Queries under 1 MB at the larger SF are reported but not classified —
at that size constant per-job overhead swamps the signal.

Usage: python3 tools/shuffle_scaling.py <bench_small.json> <bench_big.json>
          [growth] [emb_growth]
Prints one JSON object; redirect to SCALING_r{N}.json.
"""
import sys, json

EMB_FAMILIES = ("q_sim_", "q_dedup_semantic", "q_dedup_embcos", "q_emb_",
                "q_ml_kmeans", "q_ml_pca", "q_index_drift")

# Families whose DOCUMENTED candidate generation is superlinear at fixed
# index dials (COVERAGE.md rows; the recall/cost trade measured in
# RECALL.json). Everything else contracts to linear shuffle growth.
DIAL_SUPER = ("q_sim_ann_",)


def main(small_path, big_path, growth=10.0, emb_growth=4.0):
    small = json.load(open(small_path))
    big = json.load(open(big_path))
    s_mb, b_mb = small.get("shuffle_mb", {}), big.get("shuffle_mb", {})
    out = {}
    counts = {"linear": 0, "dial-super": 0, "MISMATCH": 0, "tiny": 0}
    for q in sorted(set(s_mb) & set(b_mb)):
        g = emb_growth if q.startswith(EMB_FAMILIES) else growth
        s, b = s_mb[q], b_mb[q]
        row = {"small_mb": round(s, 3), "big_mb": round(b, 3),
               "table_growth": g}
        if b < 1.0:
            row["class"] = "tiny"
        else:
            r = b / s if s > 0 else float("inf")
            row["ratio"] = round(r, 2)
            allowed_super = q.startswith(DIAL_SUPER)
            # 5% jitter allowance: at growth 1.0 (the sf0.001->sf0.01
            # step holds embeddings/documents constant) every bound
            # collapses to exactly 1.0 and run-to-run listener noise
            # (ratio 1.01 on byte-identical plans) would flag a
            # constant-shuffle query -- the strongest possible scaling
            # evidence -- as a MISMATCH.
            if r <= g ** 1.2 * 1.05:
                row["class"] = "linear"
            elif allowed_super and r <= g ** 2.2 * 1.05:
                row["class"] = "dial-super"
            else:
                row["class"] = "MISMATCH"
        counts[row["class"]] += 1
        out[q] = row
    flagged = {q: v for q, v in out.items() if v["class"] == "MISMATCH"}
    print(json.dumps({
        "metric": "shuffle_scaling", "small": small.get("sf"),
        "big": big.get("sf"), "growth": growth, "emb_growth": emb_growth,
        "classes": counts, "mismatches": sorted(flagged),
        "queries": out}))


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 10.0,
         float(sys.argv[4]) if len(sys.argv) > 4 else 4.0)
