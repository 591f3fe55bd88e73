#!/usr/bin/env python3
"""Compare two ScaleSmoke artifacts' deep-factor points (the round-12
reproducibility check): for every (family, factor>=40) present in both,
report median-vs-median and min-vs-min ratios, each run's io-sentinel
median, and flag any point whose min-vs-min ratio exceeds the two runs'
io-sentinel ratio by more than 1.5x (min-of-samples is contention-proof
in the slow direction, so a real code delta shows there first).

Usage: cmp_smoke.py A.json B.json [factor_floor]
"""
import json, re, sys


def load(path):
    txt = open(path).read()
    m = re.search(r'\{.*\}', txt, re.S)
    return json.loads(m.group(0))


def med(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    floor = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    io_a = med(a.get("io_sentinel", [1.0]))
    io_b = med(b.get("io_sentinel", [1.0]))
    io_ratio = max(io_a, io_b) / max(min(io_a, io_b), 1e-9)
    print(f"io sentinel medians: A={io_a:.2f}s B={io_b:.2f}s ratio={io_ratio:.2f}")
    bad = []
    for fam, pts_a in sorted(a["families"].items()):
        pts_b = b["families"].get(fam)
        if not pts_b:
            continue
        by_b = {p["factor"]: p for p in pts_b}
        for pa in pts_a:
            n = pa["factor"]
            if n < floor or n not in by_b:
                continue
            pb = by_b[n]
            mr = max(pa["sec"], pb["sec"]) / max(min(pa["sec"], pb["sec"]), 1e-9)
            nr = max(pa["min"], pb["min"]) / max(min(pa["min"], pb["min"]), 1e-9)
            flag = " <-- DIVERGED" if nr > 1.5 * io_ratio and \
                abs(pa["min"] - pb["min"]) > 1.0 else ""
            print(f"{fam:20s} x{n:<4d} med A={pa['sec']:7.2f} B={pb['sec']:7.2f} "
                  f"(x{mr:4.2f})  min A={pa['min']:7.2f} B={pb['min']:7.2f} "
                  f"(x{nr:4.2f})  clean A={pa.get('clean','?')}/{pa.get('samples','?')} "
                  f"B={pb.get('clean','?')}/{pb.get('samples','?')}{flag}")
            if flag:
                bad.append((fam, n))
    print(f"--- diverged beyond 1.5x io-ratio on min-vs-min: {bad if bad else 'none'}")


if __name__ == "__main__":
    main()
