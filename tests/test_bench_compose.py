"""The round-5 bench-artifact robustness contract: the composed JSON
must parse and carry explicit nulls no matter which phases have results
(rounds 2-4 each lost the external perf number to the old all-or-nothing
print; VERDICT r4 item 1)."""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "bench_mod", os.path.join(REPO, "bench.py")
)
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)  # module level only defines helpers


DEN = {
    "times": {
        "w8a8": 2.957, "w8": 3.755, "w8a8_int8qk8": 3.02,
        "w8a8_768_fwd": 27.833, "w8a8_768_step": 83.499,
        "w8a8_768_qk8_step": 73.55,
    },
    "nbytes": 11.15 * 2**30,
    "t_swap_mmdit": 330.0,
}
TEXT = {"t_text": 0.097, "t_swap_text": 258.0,
        "link_bw": {"contig": 0.033, "multileaf": 0.034}}
VAE = {"t_dec": 2.8, "t_dec_768": 33.42, "t_swap_vae": 23.0}
TRAIN = {"t_train_step": 0.1738, "train_model_tflops": 76.2,
         "t_train_step_11b_analytic": 1.65, "train_tokens": 2816,
         "t_train_step_129f": 0.618, "train_model_tflops_129f": 87.8,
         "train_tokens_129f": 8960}
FLOW = {"e2e_measured": 155.7, "t_text": 3.9, "t_denoise": 149.0,
        "t_dec": 2.8}

ALL = {"denoise": DEN, "text": TEXT, "vae": VAE, "train": TRAIN,
       "flow": FLOW}


def _assert_parses(d):
    # the driver stores exactly this line; it must round-trip as JSON
    j = json.loads(json.dumps(d))
    assert "detail" in j and "phases_done" in j["detail"]
    return j


def test_compose_empty_is_parsed_with_nulls():
    d = _assert_parses(bench.compose({}, {}, 1.0))
    assert d["value"] is None
    det = d["detail"]
    assert det["step_time_w8a8_s"] is None
    assert det["phases_done"] == []
    assert set(det["phases_missing"]) == set(bench._PHASE_ORDER)


def test_compose_full_composes_headline():
    d = _assert_parses(bench.compose(dict(ALL), {}, 100.0))
    det = d["detail"]
    # e2e = text + 50*step + decode
    assert abs(d["value"] - (0.097 + 50 * 2.957 + 2.8)) < 0.2
    assert d["vs_baseline"] is not None
    assert det["vs_baseline_768px_int8"] is not None
    assert det["train_model_tflops_129f"] == 87.8
    assert det["e2e_measured_flow_s"] == 155.7
    assert det["phases_missing"] == {}


def test_compose_survives_any_single_missing_phase():
    for missing in bench._PHASE_ORDER:
        results = {k: v for k, v in ALL.items() if k != missing}
        d = _assert_parses(
            bench.compose(results, {missing: "skipped: test"}, 50.0)
        )
        det = d["detail"]
        assert missing in det["phases_missing"]
        if missing in ("denoise", "text", "vae"):
            assert d["value"] is None  # headline needs all three
        else:
            assert d["value"] is not None


def test_last_json_line_recovers_partial_child_output():
    out = (
        "[bench] some log\n"
        '{"a": 1}\n'
        '{"a": 1, "b": 2}\n'
        '{"a": 1, "b": 2, "TRUNCAT'  # killed mid-write
    )
    assert bench._last_json_line(out) == {"a": 1, "b": 2}
    assert bench._last_json_line("") is None
    assert bench._last_json_line(None) is None


def test_timed_equal_counts_mode():
    # n1 == n2 means "too expensive to run twice differentially"
    calls = []

    def fn():
        calls.append(1)
        return 7

    dt = bench._timed(fn, lambda o: o, n1=3, n2=3)
    assert dt >= 0.0
    assert len(calls) == 4  # 1 warm + 3 timed
