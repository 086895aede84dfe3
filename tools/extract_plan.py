#!/usr/bin/env python3
"""Extract one query's section from a graft.PlanAudit dump.

Usage: extract_plan.py <plans.txt> <query> [out_file]
"""
import sys

def section(path, q):
    out, take = [], False
    for line in open(path, errors="replace"):
        if line.startswith("=========="):
            take = line.strip() == f"========== {q} =========="
            continue
        if take:
            out.append(line)
    return "".join(out).strip() + "\n"

if __name__ == "__main__":
    plans, q = sys.argv[1], sys.argv[2]
    text = section(plans, q)
    if len(sys.argv) > 3:
        open(sys.argv[3], "w").write(text)
        print(f"wrote {sys.argv[3]} ({len(text)} bytes)")
    else:
        sys.stdout.write(text)
