#!/usr/bin/env python3
"""Self-evidencing leak scan: greps the repo's non-generated text files
for classes of strings that must never appear in a public, spec-derived
codebase — private-infrastructure imports/URLs/buckets, chat-tool links,
credential-shaped tokens, unexplained environment prefixes.

Writes LEAKCHECK_SELF.json with a scan timestamp and the scanned-LoC
count so each round's "0 hits" claim carries its own evidence (what was
scanned, when, how much). Exit 1 on any hit.

The patterns are deliberately GENERIC (shape-based, not name-based):
this file must itself stay leak-free.
"""
import json, os, re, sys, time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCAN_EXT = {".scala", ".sbt", ".py", ".md", ".yaml", ".yml", ".json",
            ".sql", ".test", ".conf", ".properties", ".txt"}
SKIP_DIRS = {"target", ".git", ".idea", ".bloop", "project"}
SKIP_FILES = {"LEAKCHECK_SELF.json", "LEAKCHECK.json",
              "leakcheck.py"}  # the scanner's own pattern literals

# public hosts that legitimately appear in docs/specs/test fixtures
PUBLIC_HOST_ALLOW = re.compile(
    r"(localhost|127\.0\.0\.1|example\.(com|org|net)|apache\.org|"
    r"github\.com|githubusercontent\.com|ietf\.org|rfc-editor\.org|"
    r"w3\.org|iso\.org|itu\.int|confluent\.io|debezium\.io|"
    r"postgresql\.org|mysql\.com|mongodb\.com|snowflake\.com|"
    r"clickhouse\.com|duckdb\.org|scala-lang\.org|scala-sbt\.org|"
    r"kafka\.apache\.org|spark\.apache\.org|maven\.org|mvnrepository\.com|"
    r"deno\.(land|com)|etherscan\.io|ethereum\.org|openjdk\.org|"
    r"oracle\.com|wikipedia\.org|arxiv\.org|aclanthology\.org|"
    r"json-schema\.org|fasterxml\.com|javadoc\.io|getdozer\.io|"
    r"dozer\.com|commoncrawl\.org|huggingface\.co)", re.I)

# obviously-synthetic fixture hosts: RFC 2606/6761 reserved TLDs,
# single-label placeholders (no dot), and this repo's URL-operator
# test hosts (ex.com family — crafted, not real, endpoints)
SYNTHETIC_HOST = re.compile(
    r"(^[A-Za-z0-9-]+$|\.(invalid|test|example|localhost)$|"
    r"(^|\.)ex\.com$|^x\.co\.uk$|^x\.spam\.net$)", re.I)

CHECKS = {
    # credential shapes
    "aws-access-key": re.compile(r"\bAKIA[0-9A-Z]{16}\b"),
    "private-key-block": re.compile(r"-----BEGIN (RSA |EC |OPENSSH )?PRIVATE KEY-----"),
    "bearer-token": re.compile(r"\b(sk|pk|rk)-[A-Za-z0-9]{20,}\b"),
    # chat-tool deep links
    "slack-link": re.compile(r"\b[a-z0-9-]+\.slack\.com/|slack://", re.I),
    # cloud-storage buckets (any scheme-addressed bucket is suspect in a
    # zero-egress, local-parquet project)
    "storage-bucket": re.compile(r"\b(s3|gs|s3a|s3n|abfss?|wasbs?)://[a-z0-9._-]{3,}/", re.I),
}
URL = re.compile(r"https?://([A-Za-z0-9.-]+)")


def scan():
    hits = {k: [] for k in CHECKS}
    hits["non-public-url"] = []
    loc = 0
    nfiles = 0
    for dirpath, dirnames, filenames in os.walk(ROOT):
        dirnames[:] = [d for d in dirnames if d not in SKIP_DIRS]
        for fn in filenames:
            if fn in SKIP_FILES: continue
            if os.path.splitext(fn)[1] not in SCAN_EXT: continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, ROOT)
            try:
                lines = open(path, encoding="utf-8", errors="replace").read().splitlines()
            except OSError:
                continue
            nfiles += 1
            loc += len(lines)
            for i, line in enumerate(lines, 1):
                for name, rx in CHECKS.items():
                    if rx.search(line):
                        hits[name].append(f"{rel}:{i}")
                for m in URL.finditer(line):
                    host = m.group(1)
                    if not (PUBLIC_HOST_ALLOW.search(host) or
                            SYNTHETIC_HOST.search(host)):
                        hits["non-public-url"].append(f"{rel}:{i} {host}")
    return hits, loc, nfiles


def main():
    hits, loc, nfiles = scan()
    n = sum(len(v) for v in hits.values())
    report = {
        "scanned_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "scanned_files": nfiles,
        "scanned_loc": loc,
        "n_hits": n,
        "hits": hits,
    }
    out = os.path.join(ROOT, "LEAKCHECK_SELF.json")
    json.dump(report, open(out, "w"), indent=2)
    print(f"leakcheck: {nfiles} files, {loc} lines, {n} hits -> {out}")
    for k, v in hits.items():
        for h in v[:20]:
            print(f"  {k}: {h}")
    return 1 if n else 0


if __name__ == "__main__":
    sys.exit(main())
