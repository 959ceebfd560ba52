#!/usr/bin/env python3
"""Diff two BENCH_SHUF_EVENTS.jsonl sidecars (round-17 artifact: one
tagged stage-completion event per line) and print the first divergent
stage per disagreeing query — so a cross-environment byte question
takes minutes instead of a round (VERDICT r17 "Next round" #8).

Stage IDs are session-global and differ across environments, so stages
are aligned per query tag BY POSITION in listener delivery order (the
sweep runs queries in sorted name order, so per-tag order is stable);
the comparison keys are (tasks, bytes). Usage:

    python3 tools/diff_shuf_events.py A.jsonl B.jsonl [--all]

Exit 0 = per-tag byte totals agree everywhere; 1 = at least one tag
diverges (details printed).
"""
import json
import sys
from collections import defaultdict


def load(path):
    env = None
    tags = defaultdict(list)
    with open(path, encoding="utf-8") as f:
        for ln in f:
            ln = ln.strip()
            if not ln:
                continue
            try:
                row = json.loads(ln)
            except json.JSONDecodeError as e:
                print(f"{path}: skipping unparseable line: {e}", file=sys.stderr)
                continue
            if "env" in row:
                env = row["env"]
            else:
                tags[row["q"]].append(row)
    return env, tags


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    show_all = "--all" in sys.argv
    if len(args) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    (env_a, a), (env_b, b) = load(args[0]), load(args[1])
    print(f"A env: {env_a}\nB env: {env_b}")

    divergent = 0
    tags = sorted(set(a) | set(b))
    for t in tags:
        ea, eb = a.get(t, []), b.get(t, [])
        ta, tb = sum(e["bytes"] for e in ea), sum(e["bytes"] for e in eb)
        if ta == tb and len(ea) == len(eb) and not show_all:
            continue
        if ta == tb and len(ea) == len(eb):
            print(f"  {t}: OK ({len(ea)} stages, {ta} bytes)")
            continue
        divergent += 1
        print(f"  {t}: A {len(ea)} stages / {ta} bytes  vs  "
              f"B {len(eb)} stages / {tb} bytes  (delta {tb - ta:+d})")
        # first positionally-divergent stage under the tag
        for i in range(max(len(ea), len(eb))):
            sa = ea[i] if i < len(ea) else None
            sb = eb[i] if i < len(eb) else None
            ka = (sa["tasks"], sa["bytes"]) if sa else None
            kb = (sb["tasks"], sb["bytes"]) if sb else None
            if ka != kb:
                def fmt(s):
                    if s is None:
                        return "<absent>"
                    nm = f" name={s['name']!r}" if "name" in s else ""
                    return (f"stage={s['stage']} attempt={s['attempt']} "
                            f"tasks={s['tasks']} bytes={s['bytes']}{nm}")
                print(f"    first divergence at position {i}:")
                print(f"      A: {fmt(sa)}")
                print(f"      B: {fmt(sb)}")
                break
        # duplicate (stageId, attempt) rows = double-fired completions
        for side, ev in (("A", ea), ("B", eb)):
            seen = defaultdict(int)
            for e in ev:
                seen[(e["stage"], e["attempt"])] += 1
            dups = {k: n for k, n in seen.items() if n > 1}
            if dups:
                print(f"    {side}: DOUBLE-FIRED completions: {dups}")

    n = len(tags)
    print(f"{n - divergent}/{n} tags agree on (stage count, total bytes); "
          f"{divergent} divergent")
    return 1 if divergent else 0


if __name__ == "__main__":
    sys.exit(main())
