"""Fast-mode spec parsing for the one-command fidelity gate
(scripts/validate_fidelity.py — protocol from docs/perf_audit.md:
exact vs fast render, SyncNet confidence within 2%, BASELINE.md)."""

import os

import pytest

from scripts.validate_fidelity import _clear_fast_env, _set_fast_env

KNOBS = ("LATENTSYNC_INT8", "LATENTSYNC_DEEPCACHE", "LATENTSYNC_CFG_INTERVAL")


@pytest.fixture(autouse=True)
def _restore_env():
    saved = {k: os.environ.get(k) for k in KNOBS}
    yield
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


def test_full_spec_sets_all_knobs():
    _set_fast_env("int8,deepcache=2:1,cfg=0:0.5")
    assert os.environ["LATENTSYNC_INT8"] == "1"
    assert os.environ["LATENTSYNC_DEEPCACHE"] == "2:1"
    assert os.environ["LATENTSYNC_CFG_INTERVAL"] == "0:0.5"


def test_partial_spec_resets_other_knobs():
    _set_fast_env("int8,deepcache=3:1,cfg=0:0.5")
    _set_fast_env("int8")
    assert os.environ["LATENTSYNC_INT8"] == "1"
    assert os.environ["LATENTSYNC_DEEPCACHE"] == "0"
    assert os.environ["LATENTSYNC_CFG_INTERVAL"] == ""


def test_clear_disables_everything():
    _set_fast_env("int8,deepcache=2:1,cfg=0:0.5")
    _clear_fast_env()
    assert os.environ["LATENTSYNC_INT8"] == "0"
    assert os.environ["LATENTSYNC_DEEPCACHE"] == "0"
    assert os.environ["LATENTSYNC_CFG_INTERVAL"] == ""


def test_unknown_token_rejected():
    with pytest.raises(SystemExit):
        _set_fast_env("int8,fp4")


class _KnobStub:
    """Minimal stand-in for the pipeline instance: _flop_cut_knobs became
    an instance method in r4 (it validates dc_depth against the config's
    block count)."""

    def __init__(self):
        from latentsync_tpu.config import LatentSyncConfig

        self.config = LatentSyncConfig()


def _knobs(num_steps):
    from latentsync_tpu.pipelines.lipsync import LipsyncPipeline

    return LipsyncPipeline._flop_cut_knobs(_KnobStub(), num_steps)


def test_parsed_spec_matches_pipeline_knob_semantics():
    # the spec written here must round-trip through the pipeline's
    # parser to the intended (interval, depth, lo, hi)
    from latentsync_tpu.pipelines.lipsync import LipsyncPipeline

    _set_fast_env("deepcache=2:1,cfg=0:0.5")
    assert _knobs(20) == (2, 1, False, 0, 0, 10)
    _clear_fast_env()
    assert _knobs(20) == (0, 0, False, 0, 0, 20)


def test_ladder_specs_parse_and_are_ordered():
    """Every ladder rung must round-trip through the env parser and the
    pipeline knob parser; rungs go fastest-first (monotone decreasing
    aggressiveness: interval and sub-cut never increase down the
    ladder)."""
    from latentsync_tpu.pipelines.lipsync import LipsyncPipeline
    from scripts.validate_fidelity import LADDER

    prev = None
    for spec in LADDER:
        _set_fast_env(spec)
        knobs = _knobs(20)
        interval, depth, enc, sub = knobs[0], knobs[1], knobs[2], knobs[3]
        assert interval >= 0 and depth >= 0 and sub >= 0
        key = (interval, int(enc), sub)
        if prev is not None:
            assert key <= prev, (spec, key, prev)
        prev = key
    _clear_fast_env()
