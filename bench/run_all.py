"""Run every judged-config harness; one JSON line each + a summary line."""
import json
import subprocess
import sys


def main():
    results = []
    for c in (1, 2, 3, "3b", 4, 5):
        proc = subprocess.run(
            [sys.executable, "-m", f"bench.config{c}"],
            capture_output=True, text=True)
        for line in proc.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                print(line)
                results.append(json.loads(line))
        if proc.returncode != 0:
            print(json.dumps({"config": f"config{c}", "error":
                              proc.stderr.strip()[-400:]}))
    print(json.dumps({"summary": {r["config"] + ":" + r["metric"]:
                                  r["value"] for r in results}}))


if __name__ == "__main__":
    main()
