#!/usr/bin/env python3
"""Round-over-round bench regression tripwire (tooling only).

Usage: python3 tools/benchdiff.py <prev.json> <cur.json> [--factor=2.0]
       [--min-sec=0.3] [--min-delta=0.5]

Compares per-key timings in two Bench artifacts (bench_out.json, or the
driver's BENCH_r*.json wrapper whose "tail" embeds the compact stdout
line), preferring the contention-robust t_min over the median wherever
the artifact records it. Mirrors graft.Bench.regressions / BenchSpec's
tripwires so the check can run without a JVM.

Benches never run on identical box state (fresh VM per round; a cold
page cache alone inflates a first run 1.5-3x across the board), so raw
ratios flag pure noise. The comparator drift-normalizes by the median
ratio over shared keys and flags only keys that are BOTH >factor slower
after normalization AND >=min-delta absolute seconds beyond the drift,
with either side >=min-sec, unless allowlisted with a reason in
tools/bench_allowlist.json ({"key": "reason"}). Exits 1 on flags.
"""
import json
import os
import re
import statistics
import sys


def close_blob(name):
    """The committed CLOSE blob of a round artifact: newest committed
    version from a NON-driver commit (the driver's bookkeeping commit —
    'round N: verdict/advice/correctness/bench' — overwrites the round
    artifact with a rerun measured under uncontrolled box load; r18's
    flagged three untouched keys 3-5x). Mirrors BenchSpec.closeBlobOf.
    Falls back to the newest blob when no close commit exists."""
    import subprocess
    log = subprocess.run(
        ["git", "log", "--format=%H\t%s", "--", name],
        capture_output=True, text=True)
    if log.returncode != 0:
        sys.exit(f"close:{name}: git log failed")
    commits = [ln.split("\t", 1) for ln in log.stdout.splitlines() if "\t" in ln]
    driver = re.compile(r"round \d+: verdict/advice/correctness/bench")
    pick = next((h for h, s in commits if not driver.search(s)),
                commits[0][0] if commits else None)
    if pick is None:
        sys.exit(f"close:{name}: no committed blob")
    show = subprocess.run(["git", "show", f"{pick}:{name}"],
                          capture_output=True, text=True)
    if show.returncode != 0:
        sys.exit(f"close:{name}: git show failed")
    return show.stdout


def bench_node(path):
    # "close:BENCH_r18.json" → the round's committed close blob from
    # git history instead of the (possibly driver-rerun) working-tree
    # file.
    if path.startswith("close:"):
        d = json.loads(close_blob(path[len("close:"):]))
        if "queries" in d:
            return d
        lines = re.findall(r'\{"metric":.*\}', d["tail"])
        if not lines:
            sys.exit(f"no bench line found in {path}'s tail")
        return json.loads(lines[-1])
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    lines = re.findall(r'\{"metric":.*\}', d["tail"])
    if not lines:
        sys.exit(f"no bench line found in {path}'s tail")
    return json.loads(lines[-1])


def stats(node):
    """Per-key (mins, medians, actions) from one artifact. Full details
    carry t_min + t_median + per-key action; the compact line (r17+)
    carries t_min for EVERY key as the keyset/minsv centisecond packing
    (names resolved from the committed tools/bench_keysets manifest;
    pre-r17 lines only ship the top-8 `mins` overlay)."""
    if "details" in node:
        mins = {k: v["t_min"] for k, v in node["details"].items()
                if v.get("t_min") is not None}
        meds = {k: v["t_median"] for k, v in node["details"].items()
                if v.get("t_median") is not None}
        acts = {k: v["action"] for k, v in node["details"].items()
                if v.get("action") is not None}
        return mins, meds, acts
    meds = dict(node["queries"])
    mins = {k: v for k, v in node.get("mins", {}).items() if k in meds}
    if "keyset" in node and "minsv" in node:
        manifest = os.path.join(os.path.dirname(__file__), "bench_keysets",
                                node["keyset"] + ".keys")
        if os.path.exists(manifest):
            with open(manifest) as f:
                keys = [ln for ln in f.read().split("\n") if ln]
            if len(keys) == len(node["minsv"]):
                mins = {k: v / 100.0 for k, v in zip(keys, node["minsv"])}
    return mins, meds, {}


def comparable(prev_node, cur_node):
    """Aligned (prev, cur) timing maps restricted to keys where both
    sides carry the SAME statistic (min-vs-min preferred, else
    median-vs-median) and — where recorded on both sides — the same
    per-key timed action. Mirrors BenchSpec.comparable: mixing t_min
    with medians within one comparison biases the drift estimate and
    inflates the normalized ratio of exactly the slowest keys."""
    p_min, p_med, p_act = stats(prev_node)
    c_min, c_med, c_act = stats(cur_node)
    prev, cur = {}, {}
    for k in set(p_min) | set(p_med):
        if k in p_act and k in c_act and p_act[k] != c_act[k]:
            continue
        if k in p_min and k in c_min:
            prev[k], cur[k] = p_min[k], c_min[k]
        elif k in p_med and k in c_med:
            prev[k], cur[k] = p_med[k], c_med[k]
    return prev, cur


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a.lstrip("-").split("=", 1)
                for a in sys.argv[1:] if a.startswith("--") and "=" in a)
    factor = float(opts.get("factor", 2.0))
    min_sec = float(opts.get("min-sec", 0.3))
    min_delta = float(opts.get("min-delta", 0.5))
    prev_node, cur_node = bench_node(args[0]), bench_node(args[1])
    # Artifacts timed under different actions are incomparable: the
    # full-row-checksum action (r12+) measures work the legacy count()
    # action let column pruning delete.
    pa = prev_node.get("action", "rows_legacy")
    ca = cur_node.get("action", "rows_legacy")
    if pa != ca:
        print(f"INCOMPARABLE: timed action changed ({pa} -> {ca}); "
              "skipping regression check")
        return
    prev, cur = comparable(prev_node, cur_node)
    # Load stamps adjudicate contention: a start load near the core
    # count means the box was busy before the bench began — treat any
    # flags below as box noise, not code regressions.
    for name, node in ((args[0], prev_node), (args[1], cur_node)):
        if "load_avg" in node and "procs" in node:
            s, e = node["load_avg"]
            p = node["procs"]
            tag = " [CONTENDED]" if s > p * 0.5 else ""
            print(f"{name}: load {s:.1f} -> {e:.1f} on {p} cores{tag}")
    allow = {}
    allow_path = os.path.join(os.path.dirname(__file__), "bench_allowlist.json")
    if os.path.exists(allow_path):
        with open(allow_path) as f:
            allow = json.load(f)
    shared = [(k, prev[k], c) for k, c in cur.items()
              if k in prev and prev[k] > 0 and c > 0]
    if not shared:
        sys.exit("no shared keys between artifacts")
    drift = statistics.median(c / p for _, p, c in shared)
    # Min-acquittal (mirrors Bench.regressions curMins): a median flag
    # whose own-run min sits inside the thresholds measured intra-run
    # scheduling variance on a fixed plan — contention, not code.
    cur_mins = stats(cur_node)[0]
    bad = []
    for k, p, c in shared:
        norm = (c / p) / drift
        if (norm > factor and (c - p * drift) >= min_delta
                and (p >= min_sec or c >= min_sec) and k not in allow):
            m = cur_mins.get(k)
            if m is not None and ((m / p) / drift <= factor
                                  or (m - p * drift) < min_delta):
                continue
            bad.append((norm, k, p, c))
    if bad:
        print(f"BENCH REGRESSIONS vs {args[0]} "
              f"(drift {drift:.2f}x, factor {factor}):")
        for norm, k, p, c in sorted(bad, reverse=True):
            print(f"  {k}: {p:.2f}s -> {c:.2f}s ({norm:.1f}x normalized)")
        sys.exit(1)
    print(f"OK: no regressions beyond {factor}x drift-normalized "
          f"({len(shared)} shared keys, box drift {drift:.2f}x)")


if __name__ == "__main__":
    main()
