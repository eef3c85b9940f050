#!/usr/bin/env bash
# Round-close discipline (VERDICT r12 ask #5, r13 ask #2): the committed
# bench artifact must be measured BEFORE the commit that ships it, on a
# quiet box, and the test suite — including BenchSpec's live
# freshness-gated tripwire, which only executes when bench_out.json is
# newer than the last committed BENCH_r*.json — must pass on exactly the
# tree that ships. Usage:
#
#   tools/round_close.sh <round-number> [commit message...]
#
# Order enforced:
#   1. refuse a visibly busy box (1-min load > half the cores);
#   2. run graft.Bench at sf0.1 (artifact + bench_out.json);
#   3. run sbt test — the fresh bench_out.json arms the live tripwire;
#   4. only if green, stage BENCH_r<N>.json and commit.
set -euo pipefail
cd "$(dirname "$0")/.."

round="${1:?usage: tools/round_close.sh <round-number> [message...]}"
shift || true
msg="${*:-round ${round}: bench-verified snapshot}"

cores=$(nproc)
load=$(cut -d' ' -f1 /proc/loadavg)
if python3 -c "import sys; sys.exit(0 if float('$load') > $cores/2 else 1)"; then
  echo "round_close: box is busy (load $load on $cores cores) — a bench" >&2
  echo "run now would record contention ghosts. Retry when quiet." >&2
  exit 1
fi

echo "== bench (sf0.1, local[$cores]) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS="$cores" \
  sbt -batch "runMain graft.Bench" 2>&1 | tee /tmp/round_close_bench.log \
  | grep '"metric"' || { echo "round_close: bench emitted no JSON" >&2; exit 1; }

line=$(grep -o '{"metric":.*}' /tmp/round_close_bench.log | tail -1)
nerr=$(python3 -c "import json,sys; print(json.loads(sys.argv[1])['n_errors'])" "$line")
if [ "$nerr" != "0" ]; then
  echo "round_close: bench recorded $nerr errors — not committing" >&2
  exit 1
fi

# The committed artifact mirrors the driver's BENCH_r{N}.json shape
# (compact line inside a "tail" string) so BenchSpec's artifact reader
# and tools/benchdiff.py parse both identically.
python3 - "$round" "$line" <<'EOF'
import json, sys
round_n, line = sys.argv[1], sys.argv[2]
with open(f"BENCH_r{round_n}.json", "w") as f:
    json.dump({"n": int(round_n), "rc": 0, "cpus": int(json.loads(line)["procs"]),
               "sf": 0.1, "tail": line + "\n", "parsed": None}, f, indent=2)
EOF
echo "== wrote BENCH_r${round}.json =="

echo "== sbt test (live tripwire armed by fresh bench_out.json) =="
sbt -batch test 2>&1 | tee /tmp/round_close_test.log
grep -q "All tests passed." /tmp/round_close_test.log \
  || { echo "round_close: sbt test not green" >&2; exit 1; }

# Regenerate the prose test/suite counts from the run record instead of
# hand-maintaining them (VERDICT r15 "What's wrong" #3: three rounds of
# drift). The sed anchors are the stable phrases around the numbers.
# `|| true`: under set -e a missing summary line must take the skip
# branch below, not abort a green close
ncases=$(grep -o 'Tests: succeeded [0-9]*' /tmp/round_close_test.log \
  | tail -1 | grep -o '[0-9]*' || true)
nsuites=$(grep -o 'Suites: completed [0-9]*' /tmp/round_close_test.log \
  | tail -1 | grep -o '[0-9]*' || true)
if [ -n "$ncases" ] && [ -n "$nsuites" ]; then
  sed -i "s/# [0-9]* ScalaTest cases/# $ncases ScalaTest cases/" README.md
  sed -i "s/[0-9]* ScalaTest cases; scale design/$ncases ScalaTest cases ($nsuites suites); scale design/" SURVEY.md
  sed -i "s/[0-9]* ScalaTest cases ([0-9]* suites); scale design/$ncases ScalaTest cases ($nsuites suites); scale design/" SURVEY.md
  echo "== prose counts regenerated: $ncases cases / $nsuites suites =="
fi

# Commit the WHOLE tested tree, not just the artifact: sbt test ran on
# the working tree, so an artifact-only commit could ship untested code
# next to a green stamp.
git add -A "BENCH_r${round}.json" .
git commit -m "$msg"
echo "== round ${round} closed: bench artifact committed AFTER measurement, tests green =="
