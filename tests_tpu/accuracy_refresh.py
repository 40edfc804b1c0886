"""On-chip accuracy artifact -> ACCURACY_r05.json.

The committed round-4 accuracy artifact ran on the CPU backend while
the TPU tunnel was down (meta.backend records this; Pallas/XLA parity
is bit-exact per PARITY_TPU.json, so the estimator numbers carry). This
script re-runs both configurations on the real chip and overwrites the
artifact with on-chip numbers, as the artifact's own meta note promised:

  1. the 240-frame full-res rotloop (vo / vio / vio_lc + ordering
     gates: LC must not corrupt metric scale, fused must not harm),
  2. the high-excitation wrong-prior fusion benchmark (--excited:
     must-improve gates — accelerometer beats the wrong prior).

Run: python tests_tpu/accuracy_refresh.py      (uses the tunneled TPU)
Writes ACCURACY_r05.json in the repo root. Reference comparison:
/root/reference/docs/milestones/H08_SENSOR_FUSION_AUDIT.md:726-729
(ATE 0.45 -> 0.08 m with IMU) and src/legacy/LoopClosure.cpp:275-280
(unit-scale loop edges, never audited for scale integrity).
"""

import json
import os
import subprocess
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def run_variant(out_dir, extra):
    cmd = [sys.executable, "-m", "aria_slam_tpu.eval.accuracy_benchmark",
           "--full-res", "--out", out_dir] + extra
    print("::", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, cwd=ROOT)
    if r.returncode != 0:
        raise SystemExit(f"variant failed rc={r.returncode}: {extra}")
    with open(os.path.join(out_dir, "report.json")) as f:
        return json.load(f)


def main():
    import jax

    dev = jax.devices()[0]
    print("device:", dev)
    if "TPU" not in str(dev).upper():
        raise SystemExit(f"not on chip (device={dev}); refusing to "
                         "overwrite the artifact with non-TPU numbers")

    main_rep = run_variant("/tmp/acc_r05_tpu", [])
    exc_rep = run_variant("/tmp/acc_r05_exc_tpu", ["--excited"])

    report = dict(main_rep)
    report["excited"] = {k: v for k, v in exc_rep.items()}
    # preserve the commentary key the committed artifact carries
    try:
        with open(os.path.join(ROOT, "ACCURACY_r05.json")) as f:
            prev = json.load(f)
        note = prev.get("excited", {}).get("ordering_note")
        if note is not None and "ordering_note" not in report["excited"]:
            report["excited"]["ordering_note"] = note
    except Exception:
        pass
    report["meta"]["backend"] = f"{dev} (on-chip r5 run)"
    path = os.path.join(ROOT, "ACCURACY_r05.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"ordering": report.get("ordering"),
                      "excited_ordering":
                      report["excited"].get("ordering")}, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
