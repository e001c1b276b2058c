#!/usr/bin/env python3
"""Scale-sweep super-linearity detector.

Runs graft.Bench at sf0.001 / sf0.01 / sf0.1, then compares each
query's sf0.01 -> sf0.1 wall-clock growth against the growth of its
primary fixture table. A query whose time grows much faster than its
data is a scale-killer candidate (the check that would have flagged
the round-3 embcos pair join automatically).

Flag rule: time_ratio > FLAG_FACTOR x data_ratio AND t(sf0.1) >
MIN_SECS (below that, fixed per-query costs — session/stream/JIT —
dominate and ratios are noise).

Shuffle rule: wall-clock in the fixed-cost regime hides data-movement
growth, so the same comparison runs on per-query shuffle bytes
(read+write, from Bench's task-metrics listener): flag when
bytes_ratio > FLAG_FACTOR x data_ratio AND bytes(sf0.1) > MIN_BYTES.

Usage: python3 tools/scale_sweep.py [--reuse]
  --reuse  skip the bench runs, reuse /tmp/graft_sweep_sf*.json
"""
import json
import os
import subprocess
import sys

SFS = ["0.001", "0.01", "0.1"]
FLAG_FACTOR = 1.5
MIN_SECS = 0.5
MIN_BYTES = 8 * 1024 * 1024  # below this, shuffle is metadata noise

# sf0.01 -> sf0.1 row growth by primary table: embeddings 500->2000
# (x4); documents/events/lineitem/orders/customer/part/supplier x10.
EMB_X4 = 4.0
DOC_X10 = 10.0

# queries whose dominant input is the embeddings table
EMB_QUERIES = {
    "q_knn_exact", "q_knn_cosine", "q_knn_filtered", "q_knn_multi",
    "q_knn_batch", "q_l2_kernel", "q_cosine_kernel", "q_range_search",
    "q_validate", "q_bin_source", "q_hnsw_levels", "q_hnsw_stats",
    "q_ann_ivf", "q_ann_hnsw", "q_ann_routed", "q_ann_adaptive",
    "q_ann_persisted", "q_ann_compacted", "q_ann_cells", "q_ann_trained",
    "q_ann_incremental", "q_ann_cosine", "q_ann_filtered", "q_ann_deleted",
    "q_ann_ivfpq", "q_build_range",
    "q_quantized_knn", "q_pq_knn", "q_dedup_emblsh", "q_dedup_embcos",
    "q_dedup_embcos2", "q_vectordb_search", "q_vectordb_add",
    "q_vectordb_remove", "q_vectordb_cosine", "q_vectordb_filtered",
    "q_ann_filtered_meta", "q_stream_index", "q_vectordb_batch",
    "q_vectordb_persisted", "q_vectordb_pq", "q_vectordb_sq",
    "q_vectordb_meta", "q_vectordb_pq_persisted", "q_vectordb_adaptive",
    "q_vectordb_batch_where", "q_vectordb_add_indexed", "q_vectordb_remove_indexed",
    "q_vectordb_upsert", "q_vectordb_range", "q_vectordb_sq_persisted",
    "q_vectordb_stream", "q_vectordb_dot", "q_vectordb_compact",
    "q_vectordb_stats", "q_vectordb_batch_dot", "q_vectordb_dot_persisted",
    "q_vectordb_range_cosine", "q_vectordb_pq_refined",
    "q_vectordb_batch_refined", "q_vectordb_sq_refined",
    "q_vectordb_pq_cosine", "q_vectordb_pq_cosine_refined",
    "q_vectordb_sq_cosine", "q_vectordb_sq_dot", "q_vectordb_pq_add",
    "q_vectordb_sq_remove", "q_vectordb_pq_meta",
    "q_vectordb_pq_cos_persisted", "q_vectordb_sq_dot_refined",
    "q_vectordb_pq_dot", "q_vectordb_pq_upsert", "q_vectordb_pq_stream",
    "q_vectordb_pq_compact", "q_knn_truncated",
    "q_mmr", "q_mmr_batch", "q_ann_capped", "q_ann_rebalanced",
    "q_vectordb_rebalanced", "q_vectordb_local",
    "q_bq_knn", "q_bq_refined", "q_maxsim", "q_ann_ivfpq_res",
    "q_vectordb_bq", "q_vectordb_bq_refined", "q_vectordb_bq_add",
    "q_vectordb_bq_persisted",
    # rounds 11-12: OPQ serving, routed MaxSim, local cosine/dot arms,
    # covariance/anisotropy censuses, embedding dedup/decontamination,
    # negative mining — all embeddings-dominant (x4), keeping the
    # stricter data ratio on them instead of the lenient doc x10
    "q_ann_opq", "q_vectordb_opq", "q_vectordb_opq_add",
    "q_vectordb_opq_persisted", "q_maxsim_routed", "q_maxsim_routed_selective",
    "q_vectordb_local_cosine", "q_vectordb_local_dot",
    "q_embed_cov", "q_embed_anisotropy",
    "q_dedup_semantic", "q_decontaminate_semantic",
    "q_negatives", "q_negatives_hard",
    # round 14: k-center coreset pools from embeddings
    "q_kcenter", "q_embed_drift",
    # round 15: shard-merged index serves from embeddings
    "q_ann_merged", "q_vectordb_merged",
    # round 16: shared-artifact merged serving + merge->rebalance +
    # N-way handle merge
    "q_vectordb_pq_merged", "q_vectordb_dot_merged",
    "q_vectordb_merged_rebalanced", "q_vectordb_merged_many",
    "q_vectordb_sq_split", "q_vectordb_local_pq",
    # round 17: the reshare lifecycle serves from embeddings
    "q_vectordb_reshared",
    # round 17 second tranche: router-staleness drift assigns the
    # embeddings corpus twice
    "q_router_drift",
}

# Measured, diagnosed, FORMALLY CLOSED fixture artifacts: each entry
# carries its diagnosis in the gate's scaladoc and BASELINE.md (with
# the A/B numbers for every attempted fix). The sweep reports them as
# "documented artifact" instead of re-flagging the same measurement
# every round. Applies to the SHUFFLE rule only — a new TIME flag on
# one of these still surfaces.
DOCUMENTED_ARTIFACTS = {
    "q_dedup_containment":
        "fixed synthetic phrase pool makes candidate pairs quadratic "
        "(true pairs linear 50->512); PPJoin filter A/B'd WORSE "
        "(227->285MB) and reverted — see qDedupContainment scaladoc "
        "and BASELINE.md round-12 sweep note",
}


def run_bench(sf):
    out = f"/tmp/graft_sweep_sf{sf}.json"
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=f"/root/testdata/sf{sf}")
    subprocess.run(["sbt", "-batch", "runMain graft.Bench"], env=env,
                   check=True, capture_output=True, cwd="/root/repo")
    os.replace("/tmp/graft_bench.json", out)
    return out


def main():
    reuse = "--reuse" in sys.argv
    data = {}
    for sf in SFS:
        path = f"/tmp/graft_sweep_sf{sf}.json"
        if not (reuse and os.path.exists(path)):
            path = run_bench(sf)
        with open(path) as f:
            data[sf] = json.load(f)

    # union across SFs: a query that ERRORS at one sf is absent from
    # that sf's "queries" map — it must surface as a missing row, not
    # silently drop out of the table and the flag set
    def shuf(sf, q):
        d = data[sf]
        if "shuffle_read" not in d:
            return None  # bench predates the shuffle listener
        return d["shuffle_read"].get(q, 0) + d["shuffle_write"].get(q, 0)

    def fmt_bytes(b):
        if b is None:
            return "-"
        if b >= 1 << 20:
            return f"{b / (1 << 20):.1f}M"
        if b >= 1 << 10:
            return f"{b / (1 << 10):.1f}K"
        return str(b)

    queries = sorted({q for sf in SFS for q in data[sf]["queries"]})
    print("| query | sf0.001 s | sf0.01 s | sf0.1 s | t ratio (.01->.1) | "
          "data ratio | shuffle sf0.1 | bytes ratio | verdict |")
    print("|---|---|---|---|---|---|---|---|---|")
    flagged = []
    for q in queries:
        t = [data[sf]["queries"].get(q) for sf in SFS]
        if any(x is None for x in t):
            print(f"| {q} | - | - | - | - | - | - | - | missing at some sf |")
            continue
        ratio = t[2] / t[1] if t[1] > 0 else float("inf")
        growth = EMB_X4 if q in EMB_QUERIES else DOC_X10
        verdicts = []
        if t[2] <= MIN_SECS:
            verdicts.append("clean (fixed-cost regime)")
        elif ratio > FLAG_FACTOR * growth:
            verdicts.append(f"**FLAGGED** (time x{ratio:.1f} vs data x{growth:.0f})")
            flagged.append(q)
        else:
            verdicts.append("clean")
        s1, s2 = shuf("0.01", q), shuf("0.1", q)
        if s1 is None or s2 is None:
            bratio = "-"
        else:
            bratio = f"x{s2 / s1:.1f}" if s1 > 0 else ("x0" if s2 == 0 else "new")
            # a zero base with a large sf0.1 volume is an INFINITE ratio
            # (e.g. a broadcast join falling back to shuffle past the
            # threshold) — flag it, don't let s1 == 0 dodge the rule
            if s2 > MIN_BYTES and (s1 == 0 or s2 / s1 > FLAG_FACTOR * growth):
                if q in DOCUMENTED_ARTIFACTS:
                    verdicts.append(
                        f"documented artifact: {DOCUMENTED_ARTIFACTS[q]}")
                else:
                    verdicts.append(
                        f"**SHUFFLE-FLAGGED** (bytes "
                        f"{'new at sf0.1' if s1 == 0 else f'x{s2 / s1:.1f}'} "
                        f"vs data x{growth:.0f})")
                    if q not in flagged:
                        flagged.append(q)
        print(f"| {q} | {t[0]:.2f} | {t[1]:.2f} | {t[2]:.2f} | "
              f"x{ratio:.1f} | x{growth:.0f} | {fmt_bytes(s2)} | {bratio} | "
              f"{'; '.join(verdicts)} |")
    totals = [data[sf]["value"] for sf in SFS]
    print(f"\nTotals: sf0.001 {totals[0]:.1f}s, sf0.01 {totals[1]:.1f}s, "
          f"sf0.1 {totals[2]:.1f}s; flagged: {flagged or 'none'}")
    errs = {sf: data[sf].get("errors") for sf in SFS
            if data[sf].get("errors") not in ({}, None)}
    if errs:
        print(f"Errors: {errs}")


if __name__ == "__main__":
    main()
