"""Assemble SCALE_r13.json from the three k=100 probe passes
(min-of-3), carrying the r11 30M rank decade and the earlier
worst-case decades that ride along in each pass."""

from __future__ import annotations

import json
import sys

FILES = sys.argv[1:4]
PROBES: dict[str, dict] = {}
for f in FILES:
    for line in open(f):
        if not line.startswith("{"):
            continue
        d = json.loads(line)
        name = d.get("probe")
        if not name or name == "generate":
            continue
        cur = PROBES.setdefault(name, d)
        if d["sec"] < cur["sec"]:
            PROBES[name] = d

run = {
    "k": 100,
    "rows": 10_000_000,
    "hourly_sec": PROBES["hourly"]["sec"],
    "sliding_direct_sec": PROBES["sliding_direct"]["sec"],
    "sliding_rollup_sec": PROBES["sliding_rollup"]["sec"],
    "rollup_speedup": round(
        PROBES["sliding_direct"]["sec"] / PROBES["sliding_rollup"]["sec"], 2
    ),
    "asof_sec": PROBES["asof"]["sec"],
    "exact_dedup_sec": PROBES["exact_dedup"]["sec"],
    "staleness_runmax_sec": PROBES["staleness_runmax"]["sec"],
    "mwu_ranks_sec": PROBES["mwu_ranks"]["sec"],
    "poisson_bootstrap_x100_sec": PROBES["poisson_bootstrap_x100"]["sec"],
    "poisson_bootstrap_mweighted_rows_per_sec": round(
        1_000_000_000 / PROBES["poisson_bootstrap_x100"]["sec"] / 1e6, 1
    ),
    "decay_features_sec": PROBES["decay_features"]["sec"],
    "rank_decile_10m_sec": PROBES["rank_decile_10m"]["sec"],
    "rank_grouped_zipf_10m_sec": PROBES["rank_grouped_zipf_10m"]["sec"],
    "rank_grouped_zipf_head_group_rows": PROBES["rank_grouped_zipf_10m"][
        "head_group_rows"
    ],
    "rank_grouped_zipf_window_baseline_sec": PROBES[
        "rank_grouped_zipf_10m_window_baseline"
    ]["sec"],
    "rank_grouped_zipf_speedup_vs_window": round(
        PROBES["rank_grouped_zipf_10m_window_baseline"]["sec"]
        / PROBES["rank_grouped_zipf_10m"]["sec"],
        2,
    ),
    "census_topk_10m_sec": PROBES["census_topk_10m"]["sec"],
    "census_topk_window_baseline_sec": PROBES[
        "census_topk_10m_window_baseline"
    ]["sec"],
    "census_topk_speedup_vs_window": round(
        PROBES["census_topk_10m_window_baseline"]["sec"]
        / PROBES["census_topk_10m"]["sec"],
        2,
    ),
}

out = {
    "metric": "scale probe",
    "runs": [
        run,
        {
            "rank_decile_rows": 30_000_000,
            "rank_decile_sec": 23.57,
            "rank_decile_mrows_per_sec": 1.27,
            "note": "30M decade carried from SCALE_r11 (untouched path).",
        },
    ],
    "note": (
        "tools/scale_probe.py on local[32], round 13 (min-of-3 across "
        "three full passes; k<=300/k=1000 decades carried from "
        "SCALE_r08/r09/r10 - untouched paths).  New this round: "
        "census_topk_10m - the unpartitioned row_number census family "
        "re-plan (VERDICT r12 items 2+5) probed on a 10M-row synthetic "
        "phrase-census frame: orderBy+limit compiles to "
        "TakeOrderedAndProject (per-partition heaps, 20 rows cross to "
        "the driver-side merge) vs the old unpartitioned row_number "
        "window that sorts ALL 10M rows in ONE task; both forms "
        "asserted to elect the identical top-20 inline.  The local gap "
        "understates the cluster story - the window baseline cannot "
        "parallelize at all, at any cluster width.  Grouped-zipf/"
        "bootstrap/CC/knn probes re-run within variance."
    ),
    "cc": {
        "cc_path_2e20": {
            "vertices": 1_048_576,
            "sec": PROBES["cc_path_2e20"]["sec"],
            "components": PROBES["cc_path_2e20"]["components"],
        },
        "cc_star_10m": {
            "vertices": 10_000_000,
            "sec": PROBES["cc_star_10m"]["sec"],
            "components": PROBES["cc_star_10m"]["components"],
        },
    },
    "knn_ivf_shortlist": {
        "vectors": PROBES["knn_ivf_shortlist"]["vectors"],
        "candidates": PROBES["knn_ivf_shortlist"]["candidates"],
        "sec": PROBES["knn_ivf_shortlist"]["sec"],
    },
}

with open("SCALE_r13.json", "w") as f:
    json.dump(out, f, indent=1)
print("wrote SCALE_r13.json")
print(json.dumps(run, indent=1))
