"""Supplementary scaling evidence: efficiency vs per-superstep work.

Runs the frozen --edges-bench job (identical protocol to bench.py
--scaling: same deterministic generator, pinned 32-way partitioning,
checkpoint_every=2, fresh JVM per level) on the PRIMARY 1 -> 4 core pair
at a LARGER edge count, to show that the measured serial cost per
superstep (driver stage-scheduling + Catalyst planning, measured
~2-3 s/superstep and core-count-independent — see BENCH.md) amortizes
as per-superstep work grows: the Amdahl model eff = (W + c) / (W + 4c)
predicts efficiency -> 1 on a real cluster where W per executor stays
constant while c does not grow.

Usage: python scripts/scaling_supplementary.py [n_edges]
Prints one JSON line; does NOT touch BENCH.md (hand-folded there).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _wait_for_quiet  # noqa: E402  (same quiet-gate as --scaling)


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 80_000_000
    results = {}
    for cores in (1, 4):
        waited = _wait_for_quiet()
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--edges-bench",
             "--n-edges", str(n_edges), "--cores", str(cores),
             "--partitions", "32"],
            capture_output=True, text=True, env=env, check=True,
        )
        results[cores] = json.loads(proc.stdout.strip().splitlines()[-1])
        results[cores]["quiet_wait_s"] = waited

    def eff(key: str) -> float:
        return round((results[4][key] / results[1][key]) / 4, 4)

    print(json.dumps({
        "metric": "scaling_efficiency_supplementary",
        "n_edges_directed": n_edges,
        "pagerank": {
            "edges_per_sec@1": results[1]["pr_edges_per_sec"],
            "edges_per_sec@4": results[4]["pr_edges_per_sec"],
            "efficiency_1_to_4": eff("pr_edges_per_sec"),
            # MIN-superstep estimator: contamination only adds wall, so the
            # per-level min step is the cleanest cross-level ratio when the
            # box has residual co-tenant noise (see bench.py)
            "efficiency_1_to_4_minstep": eff("pr_edges_per_sec_minstep"),
        },
        "connected_components": {
            "edges_per_sec@1": results[1]["cc_edges_per_sec"],
            "edges_per_sec@4": results[4]["cc_edges_per_sec"],
            "efficiency_1_to_4": eff("cc_edges_per_sec"),
            # step-1 estimator: full frontier, warm JVM, identical work at
            # both levels (frontier sizes are core-count-independent)
            "efficiency_1_to_4_step1": eff("cc_step1_edges_per_sec"),
        },
        "raw": {str(c): results[c] for c in results},
    }))


if __name__ == "__main__":
    main()
