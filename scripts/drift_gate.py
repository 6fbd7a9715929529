#!/usr/bin/env python
"""TPU<->CPU numeric drift gate (VERDICT r2 weak #7).

Runs the committed golden-pass fixtures (tests/test_regression_fixture.py)
on the DEFAULT jax backend -- on a TPU host that is the real chip with the
compiled Mosaic kernels -- and compares against the CPU-generated snapshots.
The default CI suite runs the same fixtures on CPU (exact + interpret-mode
rect); this script closes the gap where a Mosaic lowering regression on
hardware would silently pass CI.

Usage:  python scripts/drift_gate.py [--out DRIFT_rN.json]
Exit 0 = both variants within tolerance.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    # the TPU rect path evaluates on the compiled Mosaic kernel whose
    # windowed tap coverage / f32 accumulation order differ slightly from
    # the CPU interpret run; the gate bounds drift, it does not demand
    # bit-equality
    ap.add_argument("--rtol", type=float, default=2e-2)
    ap.add_argument("--atol", type=float, default=2e-2)
    args = ap.parse_args()

    import jax

    import test_regression_fixture as F

    backend = jax.default_backend()
    report = {"backend": backend,
              "device": str(getattr(jax.devices()[0], "device_kind", "?"))}
    ok = True
    for name, fixture, rect, warp in (
            ("exact", F.FIXTURE, False, False),
            ("rect", F.FIXTURE_RECT, True, False),
            ("warp", F.FIXTURE_WARP, True, True)):
        stats = F._stats(*F._run_golden_pass(rect=rect, warp=warp))
        ref = json.loads(fixture.read_text())
        worst = max((abs(stats[k] - v) / max(args.atol, args.rtol * abs(v)))
                    for k, v in ref.items())
        passed = worst <= 1.0
        ok &= passed
        report[name] = {"passed": bool(passed),
                        "worst_rel_to_tolerance": round(float(worst), 3),
                        "stats": {k: round(v, 5) for k, v in stats.items()}}
        print(f"[drift] {name}: {'OK' if passed else 'FAIL'} "
              f"(worst {worst:.2f}x tolerance)", file=sys.stderr)
    if args.out:
        from pathlib import Path

        Path(args.out).write_text(json.dumps(report, indent=1))
    print(json.dumps({k: v for k, v in report.items()}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
