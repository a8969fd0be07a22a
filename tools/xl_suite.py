"""Drift-immune XL re-record (r10 verdict task #4): every XL operator
row is produced in its OWN subprocess JVM (the tools/xl_one.py
pattern), min-of-2 where the op is re-runnable, so no row can inherit
heap litter from a prior op — the same fresh-subprocess discipline the
r10 headline switched to, applied to the 1M record.

What runs where:

- per-op rows (the old single-JVM ``bench.py --xl-only`` suite):
  one ``python tools/xl_one.py <op> --runs=2`` subprocess each —
  exact_dedup, semantic_dedup, hyperplane_lsh_wide,
  incremental_dedup_batch (+ its one-time bucketed index build),
  simhash_blocked, lm_perplexity, doc_chunking, dup_span_removal,
  eval_decontamination, gramian_arrow, training_shards,
  ivf_pq_index (one-time build + min-of-2 query batch + recall),
  srp_candidates (count probes).
- composed sections keep their dedicated one-JVM-per-section scripts
  (each already isolated; single-run where the section mutates state):
  xl_sketch, xl_clusters, xl_semdedup_inc, xl_whitened, xl_day2.
- ``registry_at_n`` is NOT re-recorded: its rows were produced by
  xl_query.py invocations that each ran a small query batch in a
  fresh JVM (no expensive-op contamination profile); the suite only
  relabels its method to the accurate ``fresh_session_batched`` name.

The merged BENCH_XL.json carries one method string per row; the
``isolated_probe`` apology row (a drift post-mortem for the retired
single-JVM methodology) is deleted — every row now IS the isolated
reading.

Usage: python tools/xl_suite.py [--n=1000000] [--skip-day2]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

XL_ONE_OPS = [
    "ivf_pq_index",          # vector ops first (mirrors old op-order
    "semantic_dedup",        # rationale, though isolation makes order
    "hyperplane_lsh_wide",   # cosmetic now)
    "gramian_arrow",
    "exact_dedup",
    "incremental_dedup_batch",
    "simhash_blocked",
    "lm_perplexity",
    "doc_chunking",
    "eval_decontamination",
    "dup_span_removal",
    "training_shards",
    "srp_candidates",
    "containment_indexed",  # r12: in the suite proper (was hand-merged)
]

SECTION_SCRIPTS = [
    "tools/xl_sketch.py",
    "tools/xl_clusters.py",
    "tools/xl_semdedup_inc.py",
    "tools/xl_whitened.py",
    "tools/xl_day2.py",
]


def _run(cmd: list[str]) -> dict:
    """Run a subprocess, return its LAST stdout JSON line."""
    t0 = time.time()
    print("==>", " ".join(cmd), flush=True)
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:])
        raise RuntimeError(f"{cmd} failed rc={proc.returncode}")
    last = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            last = line
    print(f"    done in {round(time.time() - t0, 1)}s: {last}", flush=True)
    return json.loads(last) if last else {}


def main() -> int:
    n = 1_000_000
    skip_day2 = "--skip-day2" in sys.argv
    only_ops: list[str] | None = None
    skip_sections = "--skip-sections" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        if a.startswith("--ops="):
            only_ops = a.split("=", 1)[1].split(",")

    py = sys.executable
    queries: dict[str, float] = {}
    detail: dict[str, dict] = {}
    top: dict = {
        "n_docs": n,
        "n_vectors": n,
        "method": "fresh_isolated_per_op_min_of_2 (tools/xl_suite.py)",
    }

    for op in XL_ONE_OPS:
        if only_ops is not None and op not in only_ops:
            continue
        try:
            row = _run([py, "tools/xl_one.py", op, f"--n={n}", "--runs=2"])
        except RuntimeError:
            # OOM-prone second run in the same JVM (e.g. the 84M-
            # candidate SRP join at 1M): a single fresh-JVM run is
            # still a drift-immune reading — retry min-of-1
            print(f"    retrying {op} with --runs=1", flush=True)
            try:
                row = _run(
                    [py, "tools/xl_one.py", op, f"--n={n}", "--runs=1"]
                )
                row["method"] = "isolated_fresh_session_single_run"
            except RuntimeError as e:
                print(f"    {op} FAILED twice: {e}", flush=True)
                detail[op] = {"error": str(e)}
                continue
        detail[op] = row
        if op == "ivf_pq_index":
            top["ivf_pq_index"] = {
                "corpus": n,
                "n_queries": row["n_queries"],
                "method": "fresh_isolated (build single, query min of 2)",
                "build_sec": row["build_sec"],
                "query_batch_sec": row["query_batch_min_sec"],
                "recall_at3_vs_brute_force": row[
                    "recall_at3_vs_brute_force"
                ],
            }
        elif op == "incremental_dedup_batch":
            top["index_build_sec"] = row["index_build_sec"]
            queries[op] = row["min_sec"]
        elif op == "srp_candidates":
            top["srp_candidates"] = {
                "bands16x16bit": row["bands16x16bit"],
                "bands16x24bit": row["bands16x24bit"],
            }
        elif op == "training_shards":
            pass  # merged as its own section row below
        else:
            queries[op] = row["min_sec"]

    top["queries"] = queries
    top["per_op_detail"] = detail
    training_row = None
    ts = detail.get("training_shards")
    if ts and "error" not in ts:
        training_row = {
            "n_docs": n,
            "n_shards": 64,
            "method": "fresh_isolated_session",
            "oneshot_write_sec": ts["oneshot_write_sec"],
            "two_batch_append_sec": ts["two_batch_append_sec"],
            "note": "real partitioned parquet writes (900K one-shot; "
            "100K + 900K batch appends with re-crawl guard + offset "
            "continuation)",
        }

    # merge op rows NOW — a later section failure must not lose them
    from bench import _merge_bench_xl

    path = "/root/repo/BENCH_XL.json"
    if only_ops is None or set(XL_ONE_OPS) <= set(only_ops):
        _merge_bench_xl("/root/repo", top)
    else:
        # partial-op resume: merge only what this run produced into
        # the existing top-level rows
        with open(path) as fh:
            cur = json.load(fh)
        cur_q = cur.get("queries", {})
        cur_q.update(queries)
        cur_d = cur.get("per_op_detail", {})
        cur_d.update(detail)
        patch = {"queries": cur_q, "per_op_detail": cur_d,
                 "method": top["method"],
                 "n_docs": n, "n_vectors": n}
        for k in ("ivf_pq_index", "index_build_sec", "srp_candidates"):
            if k in top:
                patch[k] = top[k]
        _merge_bench_xl("/root/repo", patch)
    if training_row:
        _merge_bench_xl("/root/repo", {"training_shards": training_row})

    # composed sections: each script is its own JVM and merges its own
    # BENCH_XL row; a failed section is reported, not fatal
    failed_sections = []
    for script in SECTION_SCRIPTS:
        if skip_sections:
            continue
        if skip_day2 and script.endswith("xl_day2.py"):
            continue
        try:
            _run([py, script, f"--n={n}"])
        except RuntimeError as e:
            print(f"    SECTION FAILED: {script}: {e}", flush=True)
            failed_sections.append(script)

    # cleanup: retire the isolated_probe apology row, drop the stale
    # spread block, relabel registry_at_n to its accurate method
    with open(path) as fh:
        doc = json.load(fh)
    doc.pop("isolated_probe", None)
    doc.pop("spread", None)
    if "registry_at_n" in doc:
        doc["registry_at_n"]["method"] = (
            "fresh_session_batched (xl_query.py: each invocation runs "
            "a small query batch in its own JVM)"
        )
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
    if failed_sections:
        print(json.dumps({"xl_suite": "partial",
                          "failed_sections": failed_sections}))
        return 1
    print(json.dumps({"xl_suite": "done", "ops": len(XL_ONE_OPS)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
