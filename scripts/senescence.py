#!/usr/bin/env python3
"""Senescence bisection (VERDICT r12 #2): the Bench validator catches
suite rows inflated 2-5x vs same-process standalone re-times (r12: q39
11.54 s suite vs 2.15 s standalone), and r12's probe showed the
inflation is NOT reproducible from a row's own 16-query recycle segment
— it accumulates JVM-wide across the ~196-entry suite and survives full
SparkSession recycles. This script separates "Spark cluster state" from
"JVM senescence" by running the same suite twice:

  A. SHARED: one JVM, full board (plain graft.Bench) — per-row suite
     times, the validated suite-vs-standalone ledger, and SEGSTATS
     lines (code cache / metaspace / classes / GC / threads / fds at
     every recycle boundary).
  B. FORKED: one fresh JVM per 16-query segment (SPARK_GRAFT_SEGMENT=
     "i:16"), same query ordering, same per-segment protocol. A fresh
     JVM per segment removes every JVM-lifetime suspect while keeping
     the Spark-session lifecycle identical.

Diff semantics: a row inflated in A (validated ledger: suite > 1.3x
standalone) but NOT in B is JVM-senescence; inflated in both is
segment-local (Spark/session) state; SEGSTATS trends in A name which
JVM counter grows with position. Runs are strictly sequential — do not
run anything else on the box while this executes (~1 h at sf0.1).

Usage: python3 scripts/senescence.py [sf_dir] [out_dir]
Writes <out_dir>/shared.json, seg_<i>.json, shared.log, seg_<i>.log,
and REPORT.md.
"""
import json, math, os, re, subprocess, sys

SEG = 16


def run(env, out_json, log_path):
    e = dict(os.environ)
    e.update(env)
    e["SPARK_GRAFT_BENCH_OUT"] = out_json
    with open(log_path, "w") as log:
        subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       env=e, stdout=log, stderr=subprocess.STDOUT,
                       check=False, cwd=os.path.dirname(
                           os.path.dirname(os.path.abspath(__file__))))
    return json.load(open(out_json))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/senescence"
    os.makedirs(out, exist_ok=True)

    print("== A: shared-JVM full suite", flush=True)
    shared = run({"SPARK_GRAFT_SF_DIR": sf_dir},
                 f"{out}/shared.json", f"{out}/shared.log")
    # segment basis comes from the artifact's own registry (Bench emits
    # SparkEntry.queries' sorted names — exactly the list its segment
    # mode slices), so a future board-wide extra row with a different
    # naming convention can never misalign nseg (ADVICE r13); the name
    # heuristic stays only as a fallback for pre-r14 artifacts
    names = shared.get("registry") or sorted(
        k for k in shared["queries"]
        if not k.endswith("_bucketed")
        and k != "q192_dup_quality_lift_artifacts")
    nseg = math.ceil(len(names) / SEG)

    forked_q, forked_val = {}, {}
    for i in range(nseg):
        print(f"== B: forked segment {i}/{nseg}", flush=True)
        seg = run({"SPARK_GRAFT_SF_DIR": sf_dir,
                   "SPARK_GRAFT_SEGMENT": f"{i}:{SEG}"},
                  f"{out}/seg_{i}.json", f"{out}/seg_{i}.log")
        forked_q.update(seg["queries"])
        forked_val.update(seg.get("validated", {}))

    # ---- report ------------------------------------------------------
    lines = ["# Senescence bisection report", "",
             f"shared run: `{shared.get('run_id', 'unstamped')}`, "
             f"{nseg} forked segments of {SEG}, sf_dir={sf_dir}", ""]
    sv = shared.get("validated", {})
    infl_a = {k: v for k, v in sv.items() if v.get("replaced")}
    infl_b = {k: v for k, v in forked_val.items() if v.get("replaced")}
    lines += [f"shared-run replacements (suite diverged >1.3x from "
              f"same-process standalone): {len(infl_a)}",
              f"forked-run replacements: {len(infl_b)}", ""]
    lines.append("| query | shared suite | shared standalone | forked suite"
                 " | shared/forked | verdict |")
    lines.append("|---|---|---|---|---|---|")
    interesting = sorted(set(infl_a) | set(infl_b) | {
        k for k in names
        if k in forked_q and forked_q[k] > 0 and shared["queries"].get(k, 0)
        > 1.3 * forked_q[k] and shared["queries"][k] >= 1.0})
    for k in interesting:
        a = shared["queries"].get(k)
        sa = sv.get(k, {}).get("standalone")
        b = forked_q.get(k)
        ratio = a / b if (a and b and b > 0) else float("nan")
        # a row never timed in any forked segment must not default into
        # the jvm-senescence bucket — without a forked observation the
        # bisection has no evidence either way (ADVICE r13)
        verdict = ("not-run-forked" if k not in forked_q or not forked_q[k]
                   or forked_q[k] <= 0
                   else "jvm-senescence" if k in infl_a and k not in infl_b
                   else "segment-local" if k in infl_b
                   else "shared-only-drift")
        lines.append(f"| {k} | {a:.2f} | "
                     f"{sa if sa is None else f'{sa:.2f}'} | "
                     f"{'' if b is None else f'{b:.2f}'} | {ratio:.2f} |"
                     f" {verdict} |")
    # SEGSTATS trend from the shared log
    lines += ["", "## SEGSTATS trend (shared run, per recycle boundary)", ""]
    seg_re = re.compile(r"SEGSTATS (tag=\S+.*)")
    for m in seg_re.finditer(open(f"{out}/shared.log").read()):
        lines.append("    " + m.group(1))
    open(f"{out}/REPORT.md", "w").write("\n".join(lines) + "\n")
    print(f"wrote {out}/REPORT.md", flush=True)


if __name__ == "__main__":
    main()
