"""The bench harness's sf1 regression tripwire (VERDICT r7 #6).

``sf1_ratio_violations`` is a pure function over the two timing dicts,
so the tripwire is pinned hermetically: a deliberate quadratic query
(10× rows → ~100× time) must trip it, linear and iteration-floor
queries must not, and the noise floor / per-query overrides apply.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import (  # noqa: E402
    SF1_RATIO_BOUND,
    host_load,
    sf1_ratio_violations,
)


def test_quadratic_query_trips():
    base = {"linear_q": 2.0, "quadratic_q": 1.5, "iter_q": 5.0}
    sf1 = {"linear_q": 16.0, "quadratic_q": 140.0, "iter_q": 14.0}
    ratios, violations = sf1_ratio_violations(base, sf1)
    assert ratios == {"linear_q": 8.0, "quadratic_q": 93.33, "iter_q": 2.8}
    assert len(violations) == 1
    assert violations[0].startswith("quadratic_q:")
    assert "93.3x" in violations[0]


def test_noise_floor_skips_tiny_probes():
    # 0.1 s → 2.0 s is 20× but under the 5 s floor: all noise, no trip
    _, violations = sf1_ratio_violations({"tiny_q": 0.1}, {"tiny_q": 2.0})
    assert violations == []
    # the same ratio above the floor trips
    _, violations = sf1_ratio_violations({"big_q": 1.0}, {"big_q": 20.0})
    assert len(violations) == 1


def test_per_query_bound_override():
    # the shipped override table is EMPTY again (adamic_adar's 12×
    # entry retired in r11 after the shuffle-sizing fix measured
    # 5.56×) — the override MECHANISM is exercised via the bounds
    # param, which merges over the table
    assert SF1_RATIO_BOUND == {}
    base = {"slow_growth_q": 2.0, "other_q": 2.0}
    sf1 = {"slow_growth_q": 22.0, "other_q": 22.0}
    ratios, violations = sf1_ratio_violations(
        base, sf1, bounds={"slow_growth_q": 12.0}
    )
    # 11x: within slow_growth_q's 12x override, past the default 9x
    # for everything else
    assert ratios["slow_growth_q"] == 11.0
    assert len(violations) == 1 and violations[0].startswith("other_q:")
    # tighter explicit bound flips the verdict
    _, violations = sf1_ratio_violations(
        base, sf1, bounds={"other_q": 15.0, "slow_growth_q": 10.0}
    )
    assert len(violations) == 1
    assert violations[0].startswith("slow_growth_q:")


def test_unknown_base_query_skipped():
    _, violations = sf1_ratio_violations({}, {"new_q": 100.0})
    assert violations == []


def test_bound_table_documented():
    # every override must stay a finite float above the default's intent
    for name, bound in SF1_RATIO_BOUND.items():
        assert isinstance(name, str) and bound > 0


def test_host_load_snapshot_shape():
    snap = host_load()
    assert snap["cpus"] >= 1
    assert "load1" in snap and snap["load1"] >= 0.0


def test_codegen_violations_detects_janino_stack():
    from bench import codegen_violations

    text = (
        "26/08/16 WARN CodeGenerator: Error calculating stats\n"
        "org.codehaus.commons.compiler.InternalCompilerException: "
        "Compiling \"GeneratedClass\": Code of method grows beyond 64 KB\n"
        "\tat org.codehaus.janino.CodeContext.makeSpace\n"
        "ordinary stderr noise\n"
    )
    hits = codegen_violations(text)
    assert len(hits) == 1 and "InternalCompilerException" in hits[0]
    # "failed to compile" is the CodeGenerator ERROR-path message
    hits = codegen_violations("ERROR CodeGenerator: failed to compile: x")
    assert len(hits) == 1
    assert codegen_violations("all quiet on the stderr front") == []


def test_codegen_violations_override_mechanism():
    from bench import codegen_violations

    text = "InternalCompilerException: Code grows beyond 64 KB in Q_KNOWN"
    assert len(codegen_violations(text)) == 1
    assert (
        codegen_violations(text, overrides={"Q_KNOWN": "documented"}) == []
    )


def test_stderr_tee_captures_child_process(tmp_path):
    """The tee must capture stderr written by a CHILD process (the
    Spark JVM inherits fd 2) while still forwarding to the original
    stream."""
    import subprocess

    from bench import _tee_stderr, _untee_stderr

    log = str(tmp_path / "cap.log")
    tee, saved = _tee_stderr(log)
    try:
        subprocess.run(
            ["sh", "-c", "echo CHILD_STACK_MARKER 1>&2"], check=True
        )
    finally:
        _untee_stderr(tee, saved)
    with open(log) as f:
        assert "CHILD_STACK_MARKER" in f.read()
