"""POSFEAT_FAST=1 resolves to the certified lite gate set at import."""
import json
import os
import subprocess
import sys

SNIPPET = (
    "import os, json\n"
    "import posfeat_tpu  # noqa: F401\n"
    "print(json.dumps({k: os.environ.get(k) for k in ("
    "'POSFEAT_SAMPLE_IMPL','POSFEAT_TOPK','POSFEAT_HEAD_RING',"
    "'POSFEAT_HEAD_IM2COL')}))\n"
)


def _run(env_extra):
    env = dict(os.environ, JAX_PLATFORMS="cpu", **env_extra)
    out = subprocess.run(
        [sys.executable, "-c", SNIPPET],
        capture_output=True, text=True, env=env, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_fast_sets_lite_gates():
    got = _run({"POSFEAT_FAST": "1"})
    assert got == {
        "POSFEAT_SAMPLE_IMPL": "quad",
        "POSFEAT_TOPK": "approx",
        "POSFEAT_HEAD_RING": "0",
        "POSFEAT_HEAD_IM2COL": "1",
    }


def test_explicit_knob_beats_fast():
    got = _run({"POSFEAT_FAST": "1", "POSFEAT_TOPK": "exact"})
    assert got["POSFEAT_TOPK"] == "exact"
    assert got["POSFEAT_SAMPLE_IMPL"] == "quad"


def test_default_leaves_knobs_unset():
    env = {k: "" for k in (
        "POSFEAT_FAST", "POSFEAT_SAMPLE_IMPL", "POSFEAT_TOPK",
        "POSFEAT_HEAD_RING", "POSFEAT_HEAD_IM2COL",
    )}
    # empty string is not "1", and setdefault must not fire
    got = _run(env)
    assert got["POSFEAT_HEAD_IM2COL"] == ""


def test_pushed_env_restores_and_wraps():
    """ADVICE r4 regression: the fast-mode lite gates are per-instance
    state pushed into os.environ only around trace/call sites — they
    must never leak into the process environment, and explicitly-set
    env values must win (be excluded from overrides)."""
    import os

    from posfeat_tpu.extract.extractor import _env_wrapped, _pushed_env

    assert "POSFEAT_TEST_GATE" not in os.environ
    seen = {}

    def fn(x):
        seen["during"] = os.environ.get("POSFEAT_TEST_GATE")
        return x + 1

    wrapped = _env_wrapped(fn, {"POSFEAT_TEST_GATE": "on"})
    assert wrapped(1) == 2
    assert seen["during"] == "on"
    assert "POSFEAT_TEST_GATE" not in os.environ  # restored

    # pre-existing value is restored, not clobbered
    os.environ["POSFEAT_TEST_GATE"] = "caller"
    try:
        with _pushed_env({"POSFEAT_TEST_GATE": "on"}):
            assert os.environ["POSFEAT_TEST_GATE"] == "on"
        assert os.environ["POSFEAT_TEST_GATE"] == "caller"
    finally:
        os.environ.pop("POSFEAT_TEST_GATE", None)

    # empty overrides: identity (no wrapper indirection)
    assert _env_wrapped(fn, {}) is fn
