#!/usr/bin/env python3
"""Compare two measurement artifacts min-vs-min (the round-12
reproducibility device, min-of-samples being contention-proof in the
slow direction).

Smoke mode (both files are ScaleSmoke artifacts): for every
(family, factor>=40) present in both, report median-vs-median and
min-vs-min ratios, each run's io-sentinel median, and flag any point
whose min-vs-min ratio exceeds the two runs' io-sentinel ratio by more
than 1.5x.

Bench mode (both files are Bench artifacts — raw stdout, BENCH_LOCAL_*
capture, or the driver's BENCH_r*.json wrapper): per-query min-vs-min,
normalized by the runs' CPU-sentinel ratio. Mins come from the
bench_named line's full queries_min map when present, else from the
final line's sparse qmin overlaid on the medians (absent = min agreed
with its median). Query names are compared by their short key (the
text before the first underscore — unique across the registry).

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


def short(name):
    return name.split("_")[0]


def parse_bench(path):
    """(medians, mins, sent, io_sent) keyed by short query key."""
    txt = open(path).read()
    try:
        whole = json.loads(txt)
        if isinstance(whole, dict) and "tail" in whole:
            txt = whole.get("tail") or ""
    except Exception:
        pass
    meds, mins, sent, io = {}, {}, None, None
    for mo in re.finditer(r'\{[^\n]*\}', txt):
        try:
            d = json.loads(mo.group(0))
        except Exception:
            continue
        if d.get("metric") == "bench_named":
            meds.update({short(k): v for k, v in d.get("queries", {}).items()})
            mins.update({short(k): v
                         for k, v in d.get("queries_min", {}).items()})
        elif d.get("metric") == "total":
            sent = d.get("sent", sent)
            io = d.get("io_sent", io)
            qm = {short(k): v for k, v in d.get("qmin", {}).items()}
            for k, v in d.get("queries", {}).items():
                meds.setdefault(short(k), v)
                # sparse qmin: absent means the min agreed with the median
                mins.setdefault(short(k), qm.get(short(k), v))
    return meds, mins, sent, io


def is_bench(path):
    try:
        d = load(path)
        return "families" not in d
    except Exception:
        return True


def cmp_bench(pa, pb):
    med_a, min_a, sent_a, io_a = parse_bench(pa)
    med_b, min_b, sent_b, io_b = parse_bench(pb)
    if not med_a or not med_b:
        sys.exit(f"no bench query maps found in {pa} / {pb}")
    sent_ratio = (max(sent_a, sent_b) / max(min(sent_a, sent_b), 1e-9)
                  if sent_a and sent_b and sent_a > 0 and sent_b > 0 else 1.0)
    print(f"cpu sentinels: A={sent_a} B={sent_b} ratio={sent_ratio:.2f}  "
          f"io: A={io_a} B={io_b}")
    rows, bad = [], []
    for q in sorted(set(med_a) & set(med_b)):
        ma, mb = min_a.get(q, -1.0), min_b.get(q, -1.0)
        if ma <= 0 or mb <= 0 or max(med_a[q], med_b[q]) <= 0.05:
            continue
        mr = max(med_a[q], med_b[q]) / max(min(med_a[q], med_b[q]), 1e-9)
        nr = max(ma, mb) / max(min(ma, mb), 1e-9)
        rows.append((nr, mr, q, ma, mb))
    rows.sort(reverse=True)
    for nr, mr, q, ma, mb in rows:
        flag = " <-- DIVERGED" if nr > 1.5 * sent_ratio and \
            abs(ma - mb) > 0.5 else ""
        print(f"{q:6s} med A={med_a[q]:7.2f} B={med_b[q]:7.2f} (x{mr:4.2f})  "
              f"min A={ma:7.2f} B={mb:7.2f} (x{nr:4.2f}){flag}")
        if flag:
            bad.append(q)
    print(f"--- diverged beyond 1.5x sentinel-ratio on min-vs-min: "
          f"{bad if bad else 'none'}")


def main():
    pa, pb = sys.argv[1], sys.argv[2]
    if is_bench(pa) and is_bench(pb):
        return cmp_bench(pa, pb)
    a, b = load(pa), load(pb)
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
        for pa_ in pts_a:
            n = pa_["factor"]
            if n < floor or n not in by_b:
                continue
            pb_ = by_b[n]
            mr = max(pa_["sec"], pb_["sec"]) / max(min(pa_["sec"], pb_["sec"]), 1e-9)
            nr = max(pa_["min"], pb_["min"]) / max(min(pa_["min"], pb_["min"]), 1e-9)
            flag = " <-- DIVERGED" if nr > 1.5 * io_ratio and \
                abs(pa_["min"] - pb_["min"]) > 1.0 else ""
            print(f"{fam:20s} x{n:<4d} med A={pa_['sec']:7.2f} B={pb_['sec']:7.2f} "
                  f"(x{mr:4.2f})  min A={pa_['min']:7.2f} B={pb_['min']:7.2f} "
                  f"(x{nr:4.2f})  clean A={pa_.get('clean','?')}/{pa_.get('samples','?')} "
                  f"B={pb_.get('clean','?')}/{pb_.get('samples','?')}{flag}")
            if flag:
                bad.append((fam, n))
    print(f"--- diverged beyond 1.5x io-ratio on min-vs-min: {bad if bad else 'none'}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # `| head` closing the pipe is fine
        pass
