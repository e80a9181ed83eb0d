"""StageTimer / ThroughputStats."""

import json

from columbiaimagesearch_tpu.common.profiling import StageTimer, ThroughputStats


def test_stage_timer():
    t = StageTimer()
    with t.stage("detect"):
        pass
    with t.stage("detect"):
        pass
    with t.stage("featurize"):
        pass
    s = t.summary()
    assert s["detect"]["count"] == 2
    assert s["featurize"]["count"] == 1
    assert json.loads(t.report())["detect"]["mean_ms"] >= 0


def test_throughput_stats():
    printed = []
    st = ThroughputStats("ing", report_every=2, printer=printed.append)
    st.toc_ok()
    st.toc_ok()   # triggers report at 2
    st.toc_fail()
    assert len(printed) == 1
    rep = json.loads(st.report())
    assert rep["ok"] == 2 and rep["failed"] == 1
