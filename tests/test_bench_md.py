"""BENCH/BASELINE.md writer: a scaling-only rerun (BENCH_SKIP_QUERIES=1
passes queries={}) must refresh the extraction section while carrying
the prior full run's builds + per-query tables forward unchanged —
never clobbering 250 measured query rows with an empty table."""

import importlib.util
import os


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _extraction(eff):
    return {
        "n_pages": 100,
        "content_scale": 1,
        "cores_lo": 4,
        "cores_hi": 16,
        "docs_per_sec_local4": 100.0,
        "docs_per_sec_local16": 100.0 * 4 * eff,
        "wall_sec_local4": 1.0,
        "wall_sec_local16": 0.25 / eff,
        "scaling_efficiency": eff,
        "scaling_efficiency_raw": eff,
        "pair_efficiencies": [eff],
        "hardware_ceiling": 0.9,
        "efficiency_vs_ceiling": round(eff / 0.9, 3),
        "work_inflation": 1.0,
        "n_chunks": 42,
        "docs_per_sec_routed_local16": 300.0,
        "routed_vs_uniform": 0.9,
        "best_window": {
            "scaling_efficiency": eff,
            "work_inflation": 1.0,
            "hardware_ceiling": 0.9,
            "docs_per_sec_local4": 100.0,
            "docs_per_sec_local16": 100.0 * 4 * eff,
        },
    }


def test_scaling_only_rerun_preserves_query_tables(tmp_path, monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    md = tmp_path / "BENCH" / "BASELINE.md"

    # full run: builds + query table written
    bench._write_bench_md(
        _extraction(0.85), {"q_alpha": 1.23, "q_beta": 0.5}, 1.73,
        {"idx_build": 2.0},
    )
    full = md.read_text()
    assert "| q_alpha | 1.23 |" in full
    assert "| idx_build | 2.0 |" in full
    assert "0.85" in full

    # scaling-only rerun: new efficiency, old tables intact
    bench._write_bench_md(_extraction(0.61), {}, 0.0, {})
    rerun = md.read_text()
    assert "0.61" in rerun and "| q_alpha | 1.23 |" in rerun
    assert "| idx_build | 2.0 |" in rerun
    assert rerun.count("## One-time index builds") == 1
    assert rerun.count("## Headline queries") == 1

    # scaling-only rerun with NO prior file: honest skip note
    md.unlink()
    bench._write_bench_md(_extraction(0.7), {}, 0.0, {})
    bare = md.read_text()
    assert "skipped this run" in bare
