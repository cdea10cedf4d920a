#!/usr/bin/env python
"""Benchmark harness.

Default mode: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

plus graph-throughput fields (supersteps_per_sec, edges_per_sec) — the
BASELINE.json target metric for PageRank+CC over the transcript-derived
edge table.

--scaling mode: runs the identical graph job at local[8] and local[32]
(separate subprocesses, so each gets a fresh JVM) on the SAME synthetic
input and reports throughput at both plus scaling efficiency
(throughput@32 / throughput@8) / 4 — the sandbox evidence protocol for the
north rule's N→4N >= 0.8 requirement (see BASELINE.md). Writes BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# graph workload scale knobs (per sf unit)
CONVS_PER_SF = 150_000
ACTORS_PER_SF = 30_000
TURNS_PER_CONV = 20
PR_SUPERSTEPS = 10


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    return float(base[2:]) if base.startswith("sf") else 0.1


def build_graph(spark, sf: float, num_partitions: int):
    from sharetrace_giraph_spark import datagen
    from sharetrace_giraph_spark.operators import edges as E

    t = datagen.generate_transcripts(
        spark,
        n_convs=max(200, int(CONVS_PER_SF * sf)),
        turns_per_conv=TURNS_PER_CONV,
        n_actors=max(40, int(ACTORS_PER_SF * sf)),
        n_communities=max(4, int(64 * sf)),
        n_hubs=3,
        seed=42,
        num_partitions=num_partitions,
    )
    contacts = E.derive_contacts(t)
    verts = E.vertex_ids(contacts)
    enc = E.encode_edges(contacts, verts)
    return t, contacts, verts, enc


def run_graph_bench(spark, sf: float, cores: int, ckpt: str) -> dict:
    from sharetrace_giraph_spark.algorithms import connected_components, pagerank, triangles
    from sharetrace_giraph_spark.operators import edges as E

    out: dict = {}

    t0 = time.monotonic()
    t, contacts, verts, enc = build_graph(spark, sf, cores)
    und = E.undirect(enc).persist()
    n_edges_directed = und.count()
    n_vertices = verts.count()
    out["edge_derivation"] = round(time.monotonic() - t0, 3)
    out["_n_vertices"] = n_vertices
    out["_n_edges_directed"] = n_edges_directed

    t0 = time.monotonic()
    pr = pagerank(
        spark, und, verts, ckpt, run_id="bench-pr",
        tolerance=0.0, max_supersteps=PR_SUPERSTEPS, resume=False,
    )
    pr_s = time.monotonic() - t0
    out["pagerank_10_supersteps"] = round(pr_s, 3)
    out["_pr_supersteps_per_sec"] = round(PR_SUPERSTEPS / pr_s, 4)
    out["_pr_edges_per_sec"] = round(n_edges_directed * PR_SUPERSTEPS / pr_s, 1)

    t0 = time.monotonic()
    cc = connected_components(
        spark, und, verts, ckpt, run_id="bench-cc", max_supersteps=30, resume=False
    )
    cc_s = time.monotonic() - t0
    out["connected_components"] = round(cc_s, 3)
    out["_cc_supersteps"] = cc.supersteps_run
    out["_cc_supersteps_per_sec"] = round(cc.supersteps_run / cc_s, 4)
    out["_cc_edges_per_sec"] = round(n_edges_directed * cc.supersteps_run / cc_s, 1)

    t0 = time.monotonic()
    total, per_vertex = triangles(spark, enc, verts)
    per_vertex.count()
    out["triangles"] = round(time.monotonic() - t0, 3)
    out["_n_triangles"] = total

    und.unpersist()
    return out


def run_relational_bench(spark, sf_dir: str) -> dict:
    import __spark_entry__ as em

    names = [
        "groupby_multi_agg",
        "filtered_sum_pushdown",
        "join_agg_revenue",
        "top1_per_key",
        "sessionize",
        "theta_self_join_pairs",
    ]
    qs = em.queries()
    out = {}
    for name in names:
        t0 = time.monotonic()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def run_edges_bench(spark, cores: int, n_edges: int, ckpt: str) -> dict:
    """Superstep-engine throughput on a directly-synthesized edge table —
    the workload for the N-vs-4N scaling evidence (compute-bound: the
    transcript-derivation stage is measured separately in the sf bench)."""
    from sharetrace_giraph_spark import datagen
    from sharetrace_giraph_spark.algorithms import connected_components, pagerank

    n_vertices = max(1000, n_edges // 40)
    canon = datagen.generate_edges(spark, n_edges // 2, n_vertices, num_partitions=cores * 2)
    # the domain shape: undirected contact graph (both directions present,
    # so no dangling vertices and no per-superstep dangling-mass pass)
    edges = canon.union(canon.selectExpr("dst AS src", "src AS dst"))
    verts = canon.selectExpr("src AS vertex_id").union(
        canon.selectExpr("dst AS vertex_id")
    ).distinct()

    out: dict = {"_n_edges_directed": n_edges, "_n_vertices": n_vertices}

    def steady(metrics: list[dict], warmup: int = 2) -> float:
        """Steady-state seconds/superstep from the driver's lineage metrics
        (first supersteps carry JIT + cache warmup; excluded from rates)."""
        rows = metrics[warmup:] if len(metrics) > warmup + 1 else metrics
        return sum(m["wall_ms"] for m in rows) / 1000.0 / len(rows)

    t0 = time.monotonic()
    pr = pagerank(
        spark, edges, verts, ckpt, run_id="scal-pr",
        tolerance=0.0, max_supersteps=12, resume=False, handle_dangling=False,
    )
    out["pagerank_12_supersteps"] = round(time.monotonic() - t0, 3)
    pr_step = steady(pr.metrics)
    out["_pr_supersteps_per_sec"] = round(1 / pr_step, 4)
    out["_pr_edges_per_sec"] = round(n_edges / pr_step, 1)

    t0 = time.monotonic()
    cc = connected_components(
        spark, edges, verts, ckpt, run_id="scal-cc", max_supersteps=12, resume=False,
    )
    out["cc_supersteps"] = cc.supersteps_run
    out["cc_wall"] = round(time.monotonic() - t0, 3)
    cc_step = steady(cc.metrics)
    out["_cc_supersteps_per_sec"] = round(1 / cc_step, 4)
    out["_cc_edges_per_sec"] = round(n_edges / cc_step, 1)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--graph-only", action="store_true")
    ap.add_argument("--edges-bench", action="store_true",
                    help="superstep throughput on a synthetic edge table (scaling workload)")
    ap.add_argument("--n-edges", type=int, default=20_000_000)
    ap.add_argument("--scaling", action="store_true", help="run at local[8] and local[32], write BENCH.md")
    args = ap.parse_args()

    if args.scaling:
        run_scaling(args.n_edges)
        return

    from sharetrace_giraph_spark.session import get_spark

    spark = get_spark(
        app_name="sharetrace-bench",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
    )
    sf = _sf_of(args.sf_dir)
    ckpt = tempfile.mkdtemp(prefix="bench-ckpt-")
    try:
        queries: dict = {}
        if args.edges_bench:
            queries.update(run_edges_bench(spark, args.cores, args.n_edges, ckpt))
        else:
            queries.update(run_graph_bench(spark, sf, args.cores, ckpt))
            if not args.graph_only:
                queries.update(run_relational_bench(spark, args.sf_dir))
        public = {k: v for k, v in queries.items() if not k.startswith("_")}
        meta = {k[1:]: v for k, v in queries.items() if k.startswith("_")}
        total = round(sum(public.values()), 3)
        print(
            json.dumps(
                {
                    "metric": "headline_queries_total_wall",
                    "value": total,
                    "unit": "sec",
                    "queries": public,
                    "sf": sf,
                    "cores": args.cores,
                    **meta,
                }
            )
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def run_scaling(n_edges: int) -> None:
    """N vs 4N evidence: the identical superstep job on the identical
    synthetic edge table at local[8] and local[32], in separate JVMs."""
    results = {}
    for cores in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--edges-bench",
             "--n-edges", str(n_edges), "--cores", str(cores)],
            capture_output=True, text=True, env=env, check=True,
        )
        line = proc.stdout.strip().splitlines()[-1]
        results[cores] = json.loads(line)

    r8, r32 = results[8], results[32]
    eff_pr = (r32["pr_edges_per_sec"] / r8["pr_edges_per_sec"]) / 4.0
    eff_cc = (r32["cc_edges_per_sec"] / r8["cc_edges_per_sec"]) / 4.0
    report = {
        "metric": "scaling_efficiency_8_to_32_cores",
        "pagerank": {
            "edges_per_sec@8": r8["pr_edges_per_sec"],
            "edges_per_sec@32": r32["pr_edges_per_sec"],
            "supersteps_per_sec@8": r8["pr_supersteps_per_sec"],
            "supersteps_per_sec@32": r32["pr_supersteps_per_sec"],
            "efficiency": round(eff_pr, 4),
        },
        "connected_components": {
            "edges_per_sec@8": r8["cc_edges_per_sec"],
            "edges_per_sec@32": r32["cc_edges_per_sec"],
            "efficiency": round(eff_cc, 4),
        },
        "n_vertices": r8["n_vertices"],
        "n_edges_directed": r8["n_edges_directed"],
    }
    print(json.dumps(report))
    _write_bench_md(report, results)


def _write_bench_md(report: dict, results: dict) -> None:
    p = report["pagerank"]
    c = report["connected_components"]
    md = f"""# BENCH — scaling evidence (sandbox protocol, see BASELINE.md)

Same deterministic synthetic edge table (V={report['n_vertices']:,},
E_directed={report['n_edges_directed']:,}, hub-skewed), identical
checkpointed superstep job at two parallelism levels in separate JVMs —
the sandbox stand-in for N vs 4N executors. Efficiency =
(throughput@32 / throughput@8) / 4; the north-rule bar is >= 0.8.

| algorithm | edges/sec @ local[8] | edges/sec @ local[32] | supersteps/sec @8 | @32 | scaling efficiency |
|---|---|---|---|---|---|
| PageRank (steady-state superstep rate) | {p['edges_per_sec@8']:,} | {p['edges_per_sec@32']:,} | {p['supersteps_per_sec@8']} | {p['supersteps_per_sec@32']} | **{p['efficiency']}** |
| Connected components (steady-state) | {c['edges_per_sec@8']:,} | {c['edges_per_sec@32']:,} | — | — | **{c['efficiency']}** |

Full per-cores JSON:

```json
{json.dumps(results[8])}
{json.dumps(results[32])}
```
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
