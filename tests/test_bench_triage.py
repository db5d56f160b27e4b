"""The two-run regression triage is pure protocol logic — pin it without
Spark: four gates (raw in both passes + run-1 under both normalizers),
run-2 probes deliberately ignored, absent/zero entries skipped."""

from bench import _prev_round_bench, _two_run_triage

PREV = {
    "queries": {"q_reg": 1.0, "q_noise1": 1.0, "q_noise2": 1.0, "q_zero": 0},
    "calib_jvm_sec": 1.0,
    "calib_jvm_med3": 1.0,
}
NORMS1 = {"calib": 1.0, "med3": 1.0}
# run-2 probes landed in a fast window — must NOT matter to the gate
NORMS2 = {"calib": 0.1, "med3": 0.1}


def test_flags_only_when_all_four_gates_exceed():
    run1 = {"q_reg": 1.5, "q_noise1": 1.5, "q_noise2": 1.1, "q_zero": 9.0}
    # q_noise1 recovered in run 2's raw clock -> raw gate clears it;
    # q_noise2 was never raw-slow in run 1 -> cleared
    run2 = {"q_reg": 1.6, "q_noise1": 1.0, "q_noise2": 1.6, "q_zero": 9.0}
    flags = _two_run_triage(PREV, run1, run2, NORMS1, NORMS2)
    assert set(flags) == {"q_reg"}
    assert flags["q_reg"] == 1.5  # min over the four gate ratios


def test_run2_normalizers_are_ignored():
    # identical raw times, but run-2 probes 10x faster: a warm-probe
    # normalized gate would flag everything — the protocol must not
    run1 = {"q_noise1": 1.2}
    run2 = {"q_noise1": 1.2}
    flags = _two_run_triage(PREV, run1, run2, NORMS1, NORMS2)
    assert flags == {}


def test_normalizer_gates_can_clear_a_raw_regression():
    # raw 1.4x in both runs, but the host probe also slowed 1.4x:
    # run-1 normalized ratios land at 1.0 -> host drift, not a flag
    run1 = {"q_reg": 1.4}
    run2 = {"q_reg": 1.4}
    flags = _two_run_triage(
        PREV, run1, run2, {"calib": 1.4, "med3": 1.4}, NORMS2
    )
    assert flags == {}


def test_missing_and_zero_entries_are_skipped():
    flags = _two_run_triage(
        PREV, {"q_absent_from_prev": 9.0}, {"q_absent_from_prev": 9.0},
        NORMS1, NORMS2,
    )
    assert flags == {}  # q_zero (t_prev=0) and unknown names both skipped


def test_prev_round_bench_picks_highest_round(tmp_path):
    import json

    (tmp_path / "BENCH_r08.json").write_text(
        json.dumps({"parsed": {"queries": {"a": 1.0}, "calib_jvm_sec": 1.0}})
    )
    (tmp_path / "BENCH_r09.json").write_text(
        json.dumps({"parsed": {"queries": {"a": 2.0}, "calib_jvm_sec": 1.0}})
    )
    (tmp_path / "BENCH_r07.json").write_text("not json at all")
    prev = _prev_round_bench(str(tmp_path))
    assert prev["queries"]["a"] == 2.0


def test_prev_round_bench_none_when_absent(tmp_path):
    assert _prev_round_bench(str(tmp_path)) is None
