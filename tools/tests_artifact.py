#!/usr/bin/env python3
"""Run the ScalaTest suite and record the evidence as TESTS.json
(suites/succeeded/failed counts + the sbt summary tail + timestamp),
so "sbt test is green" is reproducible from the repo instead of a
claim in a doc.

Usage: python3 tools/tests_artifact.py            # runs `sbt -batch test`
       python3 tools/tests_artifact.py <log-file> # parse an existing log
"""
import json
import re
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main():
    if len(sys.argv) > 1:
        out = Path(sys.argv[1]).read_text()
        rc = 0 if "All tests passed." in out else 1
    else:
        proc = subprocess.run(
            ["sbt", "-batch", "test"], cwd=ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        out, rc = proc.stdout, proc.returncode
    tail = [l for l in out.splitlines()
            if re.search(r"Run completed|Suites:|Tests:|All tests|"
                         r"\*\*\* \d+ TEST", l)]
    counts = {}
    m = re.search(r"Tests: succeeded (\d+), failed (\d+), canceled (\d+), "
                  r"ignored (\d+), pending (\d+)", out)
    if m:
        counts = dict(zip(
            ["succeeded", "failed", "canceled", "ignored", "pending"],
            map(int, m.groups())))
    s = re.search(r"Suites: completed (\d+), aborted (\d+)", out)
    artifact = {
        "ran_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "command": "sbt -batch test",
        "exit_code": rc,
        "suites_completed": int(s.group(1)) if s else None,
        "suites_aborted": int(s.group(2)) if s else None,
        **counts,
        "summary_tail": [l.strip() for l in tail][-8:],
    }
    (ROOT / "TESTS.json").write_text(json.dumps(artifact, indent=2) + "\n")
    print(json.dumps(artifact, indent=2))
    return rc


if __name__ == "__main__":
    sys.exit(main())
