"""Evidence-chain integrity: every measurement artifact that ROADMAP.md,
PERF.md or README.md cites must exist in the repository.

Round 3 cited E2E_r3.json / QUALITY_r3.json / DRIFT_r3.json that were never
committed, so the envelope/quality/drift capabilities were claims rather
than evidence (VERDICT r3 missing #2).  This test turns the rule into CI:
an artifact name matching ``<NAME>_r<N>.json`` mentioned in the docs must be
a file in the repo root (or tests/fixtures/).
"""

import pathlib
import re

ROOT = pathlib.Path(__file__).resolve().parent.parent
DOCS = ["ROADMAP.md", "PERF.md", "README.md"]
PATTERN = re.compile(r"\b([A-Z][A-Z0-9]*_r\d+\.json)\b")


def test_cited_artifacts_exist():
    missing = []
    for doc in DOCS:
        p = ROOT / doc
        if not p.exists():
            continue
        for name in set(PATTERN.findall(p.read_text())):
            if not ((ROOT / name).exists()
                    or (ROOT / "tests" / "fixtures" / name).exists()):
                missing.append(f"{doc} cites {name}")
    assert not missing, (
        "documents cite measurement artifacts that are not in the repo "
        f"(commit them or drop the citation): {missing}")
