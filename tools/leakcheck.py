#!/usr/bin/env python3
"""Repo-owned leak scan: grep the source tree for anything that looks
like a non-public reference (internal imports, URLs outside public
hosts, cloud buckets, chat links, API keys, suspicious env vars) and
write LEAKCHECK.json with a scan timestamp and a digest of the scanned
tree — so a round bump in the artifact provably corresponds to a fresh
scan of this exact tree, not a stamp.

Usage: python3 tools/leakcheck.py [round_number]
"""
import hashlib
import json
import re
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SCAN_DIRS = ["src", "tools", "project"]
SCAN_FILES = ["build.sbt", "SURVEY.md", "README.md"]
EXTS = {".scala", ".py", ".sbt", ".md", ".sh", ".sql", ".json", ".conf"}

PUBLIC_HOSTS = (
    r"(?:github\.com|apache\.org|scala-lang\.org|python\.org|numpy\.org|"
    r"scipy\.org|duckdb\.org|wikipedia\.org|arxiv\.org|doi\.org|"
    r"readthedocs\.io|spark\.apache\.org|openjdk\.org|localhost|127\.0\.0\.1|"
    r"example\.com|w3\.org|jcp\.org|scala-sbt\.org|scalatest\.org|"
    r"sourceforge\.net|ietf\.org|unicode\.org)")

PROBES = {
    # imports outside the public namespaces this repo may use
    "internal-import": re.compile(
        r"^\s*import\s+(?!graft\.|org\.apache\.|org\.scalatest|org\.scalacheck|"
        r"scala\.|java\.|javax\.|org\.slf4j|com\.fasterxml|org\.json4s|"
        r"org\.codehaus|breeze\.)[a-z]+\.[a-z_.]+\.(?:internal|private|corp)\b",
        re.M),
    # URLs on non-public hosts
    "internal-url": re.compile(
        r"https?://(?!" + PUBLIC_HOSTS + r")[a-z0-9.-]+\.(?:corp|internal|"
        r"intranet|local)\b", re.I),
    # package/group ids with internal-ish segments
    "internal-pkg2": re.compile(
        r"\b(?:com|net|io)\.[a-z0-9]+\.(?:internal|secret|corp)\.[a-z0-9.]+"),
    # cloud bucket schemes (none are used by this repo; any hit is a leak)
    "internal-bucket": re.compile(r"\b(?:s3a?|gs|abfss?|wasbs?)://[a-z0-9._/-]+"),
    # chat permalinks
    "slack-link": re.compile(r"https?://[a-z0-9-]+\.slack\.com/\S+", re.I),
    # long secret-looking literals (AWS key ids, bearer/xox tokens)
    "api-key": re.compile(r"\b(?:AKIA[0-9A-Z]{16}|xox[baprs]-[0-9A-Za-z-]{10,}|"
                          r"(?:api|secret)[_-]?key\s*[:=]\s*['\"][A-Za-z0-9+/]{20,})"),
    # env vars that would point at non-public infrastructure
    "axon-env": re.compile(r"\b[A-Z][A-Z0-9_]*(?:INTERNAL|CORP|PROD_ENDPOINT)"
                           r"[A-Z0-9_]*\b"),
}


def files():
    for d in SCAN_DIRS:
        base = ROOT / d
        if base.exists():
            for p in sorted(base.rglob("*")):
                if p.is_file() and p.suffix in EXTS:
                    yield p
    for f in SCAN_FILES:
        p = ROOT / f
        if p.exists():
            yield p


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hits = {k: [] for k in PROBES}
    tree = hashlib.sha256()
    n_files = 0
    for p in files():
        data = p.read_bytes()
        rel = str(p.relative_to(ROOT))
        tree.update(rel.encode())
        tree.update(hashlib.sha256(data).digest())
        n_files += 1
        text = data.decode("utf-8", errors="replace")
        for k, rx in PROBES.items():
            for m in rx.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[k].append(f"{rel}:{line}: {m.group(0)[:120]}")
    out = {
        "round": rnd,
        "scanned_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "n_files_scanned": n_files,
        "tree_sha256": tree.hexdigest(),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    (ROOT / "LEAKCHECK.json").write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps({k: len(v) for k, v in hits.items()}))
    print(f"tree={out['tree_sha256'][:16]} files={n_files} "
          f"hits={out['n_hits']}")
    return 0 if out["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
