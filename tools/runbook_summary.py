"""Summarize a TPU validation-runbook output directory into one table.

The runbook (tools/tpu_runbook.sh) writes one log per experiment to
$RUNBOOK_DIR (default /tmp/runbook). Each bench log ends with the JSON
line bench.py prints; probe logs end with the selection-stability JSON
record. This tool greps those terminal JSON lines and prints a compact
comparison table, so a wave of A/B results reads at a glance.

Usage: python tools/runbook_summary.py [runbook_dir]
"""

import glob
import json
import os
import sys


def last_json(path):
    rec = None
    with open(path, errors="replace") as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and line.endswith("}"):
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
    return rec


def main(root="/tmp/runbook"):
    rows = []
    for path in sorted(glob.glob(os.path.join(root, "*.log"))):
        name = os.path.basename(path)[:-4]
        rec = last_json(path)
        if rec is None:
            tail = ""
            with open(path, errors="replace") as f:
                lines = [x.strip() for x in f.readlines() if x.strip()]
            if lines:
                tail = lines[-1][:100]
            rows.append((name, "(no JSON) " + tail))
        elif "value" in rec:  # bench record
            rows.append((name, f"{rec['value']} {rec.get('unit', '')} "
                               f"(vs_baseline {rec.get('vs_baseline')})"))
        elif "delta_mma3" in rec:  # stability probe record
            rows.append(
                (name,
                 f"MMA f32 {rec['mma3_f32_xla']} vs fast {rec['mma3_bf16_pallas']} "
                 f"(d={rec['delta_mma3']}, overlap {rec['topk_overlap_mean']})")
            )
        else:
            rows.append((name, json.dumps(rec)[:120]))
    width = max((len(n) for n, _ in rows), default=10)
    for name, desc in rows:
        print(f"{name:<{width}}  {desc}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/runbook")
