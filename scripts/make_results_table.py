"""Collect run metrics into the README quality table (VERDICT r1 item #2).

Reads runs/<name>/<experiment>/metrics.csv and emits a markdown table of the
final per-rung quality metrics (energy W2/W1 + cropped, dist W2, ESS) plus
the test-phase rows.

Usage: python scripts/make_results_table.py runs/lj13_full/lj13 [more dirs...]
"""

import csv
import os
import sys


def load(path):
    with open(path) as f:
        return list(csv.DictReader(f))


def last_value(rows, key):
    for row in reversed(rows):
        v = row.get(key, "")
        if v not in ("", None):
            return float(v)
    return None


def table_for(run_dir):
    rows = load(os.path.join(run_dir, "metrics.csv"))
    keys = rows[0].keys()
    out = [f"### {run_dir}", ""]
    # validation metrics per rung: group by val/lower_temp value over time
    # data_energy_std is the ground-truth energy spread at the annealed-to
    # temperature — the scale anchor every W2 must be read against
    out.append("| eval epoch | anneal to T | energy_w2 | energy_w2_cropped | dist_w2 | ESS | GT energy σ | fill ESS (attempts) |")
    out.append("|---|---|---|---|---|---|---|---|")
    for row in rows:
        if row.get("val/energy_w2") not in ("", None):
            def g(k):
                v = row.get(k, "")
                return f"{float(v):.4g}" if v not in ("", None) else "—"

            # transition rows record the fill-quality floor outcome
            # (VERDICT r3 next #2: fill-ESS per transition)
            fill = "—"
            if row.get("val/fill_ess") not in ("", None):
                fill = (
                    f"{float(row['val/fill_ess']):.4g} "
                    f"({int(float(row.get('val/fill_attempts', 0) or 0))})"
                )
            out.append(
                f"| {row['step']} | {g('val/lower_temp')} | {g('val/energy_w2')} "
                f"| {g('val/energy_w2_cropped')} | {g('val/dist_w2')} | {g('val/ess')} "
                f"| {g('val/data_energy_std')} | {fill} |"
            )
    test_keys = sorted({k.rsplit("/", 1)[0] for k in keys if k.startswith("test/")})
    if test_keys:
        out += ["", "| test pair | energy_w2 | energy_w2_cropped | dist_w2 | energy_mean | GT energy σ |", "|---|---|---|---|---|---|"]
        for tk in test_keys:
            def g2(suffix):
                v = last_value(rows, f"{tk}/{suffix}")
                return f"{v:.4g}" if v is not None else "—"

            out.append(
                f"| {tk.split('/', 1)[1]} | {g2('energy_w2')} | {g2('energy_w2_cropped')} "
                f"| {g2('dist_w2')} | {g2('energy_mean')} | {g2('data_energy_std')} |"
            )
    return "\n".join(out)


if __name__ == "__main__":
    for d in sys.argv[1:]:
        print(table_for(d))
        print()
