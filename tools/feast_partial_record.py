"""Mine a (possibly still-running / killed) production-FEAST iteration log
into an honest partial-run ledger record.

The full artifact is written by examples/ch3cn_feast_production.py only when
feastDiagonalization returns; if a production run must be cut on a wall-clock
budget, this extracts the LAST completed FEAST iteration's Rayleigh-Ritz
eigenvalues from artifacts/iterations_ch3cn_feast_N{N}.out and appends a
{"kind": "feast_window", "partial_run": true, "iterations_completed": k}
row, with the same window bookkeeping as the example script.

Run: python tools/feast_partial_record.py N [lo_cm hi_cm]
"""
import json
import os
import re
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(ROOT, "artifacts")
LOG = os.path.join(ART, "ch3cn_production.jsonl")


def main():
    N = int(sys.argv[1])
    lo_cm, hi_cm = (float(sys.argv[2]), float(sys.argv[3])) \
        if len(sys.argv) > 3 else (350.0, 372.0)
    zpve = None
    for line in open(LOG):
        d = json.loads(line)
        if d.get("topology") == "tree" and d.get("kind") is None \
                and not d.get("depth_confirm") and int(d.get("N", -1)) == N:
            zpve = float(d["zpve_cm1"])
    assert zpve is not None

    txt = open(os.path.join(ART, f"iterations_ch3cn_feast_N{N}.out")).read()
    iters = re.findall(r"FEAST iteration: (\d+)", txt)
    blocks = re.findall(r"^Eigenvalues\n((?:\[[^\]]*\]\n?)+)", txt, re.M)
    assert blocks, "no completed FEAST iteration with eigenvalues yet"
    ev = np.array([float(x) for x in
                   re.findall(r"[-+0-9.eE]+", blocks[-1])])
    exc = ev - zpve
    in_win = sorted(round(float(e), 4) for e in exc
                    if lo_cm <= e <= hi_cm)
    rec = {"kind": "feast_window", "topology": "tree", "N": N,
           "maxD": 3, "fit_maxD": 20, "nc": 6, "m0": 4,
           "eConv": 1e-06, "window_cm1": [lo_cm, hi_cm],
           "zpve_cm1": zpve, "in_window_cm1": in_win,
           "all_ritz_cm1": [round(float(e), 4) for e in np.sort(exc)],
           "converged": False, "partial_run": True,
           "iterations_completed": len(blocks),
           "source": f"iterations_ch3cn_feast_N{N}.out (wall-budget cut)"}
    print(json.dumps(rec))
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
