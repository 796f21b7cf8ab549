"""Summarize a training metrics JSONL (train/run.py --metrics) as markdown.

Prints the eval curve (step, mAP@.5, mAP@[.5:.95], recall@50, instance-mask
IoU, semantic IoUs), train throughput, and any state-save / resume events —
the model-card table comes straight from here.

Usage: python tools/summarize_training.py RUN.jsonl
"""

from __future__ import annotations

import json
import sys


def main(argv=None) -> int:
    path = (argv or sys.argv[1:])[0]
    evals, saves, rates = [], [], []
    with open(path) as f:
        for line in f:
            row = json.loads(line)
            if row["kind"] == "eval":
                evals.append(row)
            elif row["kind"] == "state":
                saves.append(row)
            elif row["kind"] == "train" and "steps_per_s" in row:
                rates.append(row)

    print("| step | mAP@.5 | mAP@[.5:.95] | recall@50 | inst-mask IoU | sem IoU (red/blue/ball) |")
    print("|---|---|---|---|---|---|")
    for e in evals:
        s = e.get("sem_iou", {})
        sem = "/".join(
            f"{s.get(k)}" for k in ("1", "2", "3")
        )
        print(
            f"| {e['step']} | {e.get('map50')} | {e.get('map50_95')} | "
            f"{e.get('det_recall_iou50')} | {e.get('inst_mask_iou_mean')} | {sem} |"
        )
    if rates:
        last = rates[-1]
        print(
            f"\nthroughput: {last['steps_per_s']} steps/s cumulative at "
            f"step {last['step']} (wall {last['wall_s']:.0f}s)"
        )
    if saves:
        print(f"state saves: {len(saves)} (every-N crash-safe, last at step {saves[-1]['step']})")
    # resume shows up as a step that restarts the wall clock
    prev = None
    for r in rates:
        if prev is not None and r["wall_s"] < prev["wall_s"]:
            print(f"resume event: wall clock restarted at step {r['step']} (killed after step {prev['step']})")
        prev = r
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
