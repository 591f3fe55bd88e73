#!/usr/bin/env python3
"""Repo-side leak re-scan with PROVENANCE (round-9 ADVICE carry-over):
the driver's LEAKCHECK.json records only hit lists, so a zero-hit re-run
is indistinguishable from a stale artifact bump. This scanner covers the
same seven categories with public-pattern approximations and emits
LEAKCHECK_LOCAL.json with a timestamp and the scanned-file count, making
every re-run verifiable.

Usage: python3 tools/leakcheck.py [repo_root]
"""
import sys, os, re, json, datetime

root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Patterns are assembled by concatenation so this file cannot self-hit.
CATS = {
    "internal-import": re.compile(r"import\s+(?:com|io|ai)\." + r"anthropic"),
    "internal-url": re.compile(r"https?://[a-z0-9.-]*" + r"(?:anthropic|ant-internal)" + r"\.[a-z]+"),
    "internal-pkg2": re.compile(r"(?:com|io)\." + r"anthropic" + r"\.[a-z]"),
    "internal-bucket": re.compile(r"s3" + r"://[a-z0-9-]*" + r"(?:internal|anthropic)"),
    "slack-link": re.compile(r"[a-z0-9-]+\." + r"slack\.com" + r"/archives"),
    "api-key": re.compile(r"(?:AKIA[0-9A-Z]{16}|sk-" + r"ant-" + r"[A-Za-z0-9-]{8,})"),
    "axon-env": re.compile(r"[A-Z_]*" + r"AXON" + r"[A-Z_]*="),
}
SKIP_DIRS = {".git", "target", "spark-warehouse", ".bloop", ".metals", "project"}
EXTS = {".scala", ".sbt", ".py", ".md", ".json", ".sh", ".sql", ".yaml", ".yml", ".conf", ".properties", ".txt"}

hits = {k: [] for k in CATS}
scanned = 0
for dirpath, dirnames, filenames in os.walk(root):
    dirnames[:] = [d for d in dirnames if d not in SKIP_DIRS]
    for fn in filenames:
        if os.path.splitext(fn)[1] not in EXTS:
            continue
        p = os.path.join(dirpath, fn)
        if os.path.abspath(p) == os.path.abspath(__file__):
            continue  # the pattern table would self-hit
        try:
            text = open(p, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        scanned += 1
        for cat, rx in CATS.items():
            for i, line in enumerate(text.splitlines(), 1):
                if rx.search(line):
                    hits[cat].append(f"{os.path.relpath(p, root)}:{i}")

out = {
    "generated_at": datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds"),
    "files_scanned": scanned,
    "n_hits": sum(len(v) for v in hits.values()),
    "hits": hits,
}
dest = os.path.join(root, "LEAKCHECK_LOCAL.json")
json.dump(out, open(dest, "w"), indent=2)
print(f"[leakcheck] scanned {scanned} files, {out['n_hits']} hits -> {dest}")
sys.exit(1 if out["n_hits"] else 0)
