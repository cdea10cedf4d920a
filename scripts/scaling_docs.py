"""Training-data-surface scaling evidence: near-dup dedup at 1 vs 4 cores.

Runs bench.py --docs-bench (full minhash → banded-LSH → exact-Jaccard
pipeline with the max_bucket_size=64 skew guard and loud census ACTIVE,
on a deterministic synthetic corpus with planted near-dup groups and one
pathological giant duplicate cluster) on the PRIMARY 1 -> 4 core pair —
the same protocol as the graph scaling evidence: pinned 32-way
partitioning at every level, fresh JVM per level, quiet-gated start,
per-level best-of-2 wall (contamination only ever adds wall).

This is the N-vs-4N criterion applied to the LLM-training-data operator
family rather than the superstep engine: dedup is a 3-shuffle DAG
(signature agg, bucket census+semi-join, verify joins), so its serial
fraction is one Catalyst planning pass instead of 12 superstep
schedules — efficiency should sit close to the graph jobs' or above.

Usage: python scripts/scaling_docs.py [n_docs]
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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    results = {}
    for cores in (1, 4):
        waited = _wait_for_quiet()
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--docs-bench",
             "--n-docs", str(n_docs), "--cores", str(cores),
             "--partitions", "32"],
            capture_output=True, text=True, env=env, check=True,
        )
        results[cores] = json.loads(proc.stdout.strip().splitlines()[-1])
        results[cores]["quiet_wait_s"] = waited

    def rate(cores: int) -> float:
        return results[cores]["docs_per_sec"]

    print(json.dumps({
        "metric": "scaling_efficiency_docs_dedup",
        "n_docs": n_docs,
        "dedup_near_dup_pipeline": {
            "docs_per_sec@1": rate(1),
            "docs_per_sec@4": rate(4),
            "efficiency_1_to_4": round((rate(4) / rate(1)) / 4, 4),
        },
        "raw": {str(c): results[c] for c in results},
    }))


if __name__ == "__main__":
    main()