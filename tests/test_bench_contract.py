"""Driver-contract guard for bench.py's stdout line.

r03 verdict weak #2: the single JSON line grew past the driver's 2,000-char
tail window in r02 and the official perf record was machine-unreadable for
two rounds (``parsed: null``). This exercises main() with the kernel benches
stubbed out (no device needed) and asserts the line stays parseable and
under the window with margin, and that the full fold lands in
BENCH_FULL.json instead.
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def test_bench_line_fits_driver_window(tmp_path, monkeypatch):
    import bench

    monkeypatch.setattr(bench, "_probe_device", lambda *a, **k: False)
    monkeypatch.setattr(
        bench, "bench_maxsim", lambda *a, **k: (0.2446, True, 0.1117, 26.58))
    monkeypatch.setattr(bench, "bench_flat_search", lambda *a, **k: 5015.7)
    # redirect the BENCH_FULL.json side artifact away from the repo root
    monkeypatch.setenv("BENCH_ARTIFACT_DIR", str(tmp_path))

    line = bench.main()
    assert "\n" not in line
    assert len(line) < 1800, len(line)
    parsed = json.loads(line)
    assert parsed["metric"] == "colbert_top100_maxsim_rerank_p50"
    assert parsed["value"] == 0.2446
    assert parsed["vs_baseline"] > 1.0
    # the full blob exists and carries the folded artifacts the line dropped
    full = json.loads((tmp_path / "BENCH_FULL.json").read_text())
    assert "folds" in full
